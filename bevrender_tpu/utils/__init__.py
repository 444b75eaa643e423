

def enable_compilation_cache(cache_dir: str = None) -> None:
    """Persistent XLA compilation cache: flagship compiles are minutes-long
    (plus per-Pallas-kernel Mosaic compiles), so cache across processes.
    Safe to call multiple times; no-op if the config knob is absent."""
    import jax

    try:
        from pathlib import Path

        d = cache_dir or str(Path(__file__).resolve().parents[2] / ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass
