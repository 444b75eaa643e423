"""PyTorch-CPU baseline measurement.

The reference publishes no numbers and its config is redacted (BASELINE.md), so
the baseline is measured here: a torch implementation of the same flagship
architecture (uniform-28 BEVRender, see bevrender_tpu.config.flagship_config)
using the reference's *computational strategy* — dense (M, N) attention
materialized per view with a Python view loop, ``F.grid_sample`` K/V gathers
and rpe-bias sampling over the full displacement tensor — executed on CPU in
eval mode. This mirrors model/SCA_deform_attn.py:331-413 /
TSA_deform_attn.py:245-330 cost-wise without copying code.

Writes ``BASELINE_MEASURED.json`` at the repo root:
  {"torch_cpu_render_register_fps": ..., "timestamp": ..., "config": "..."}

Run: ``python baselines/torch_cpu_baseline.py [--frames N]``
"""

from __future__ import annotations

import argparse
import json
import math
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

torch.manual_seed(0)


class DenseDeformAttention(nn.Module):
    """Dense-attention block matching the reference's cost profile."""

    def __init__(self, dim, n_heads, n_keys_hw, table_hw):
        super().__init__()
        self.n_heads = n_heads
        self.ch = dim // n_heads
        self.proj_k = nn.Conv2d(dim, dim, 1)
        self.proj_v = nn.Conv2d(dim, dim, 1)
        self.proj_out = nn.Conv2d(dim, dim, 1)
        self.rpe = nn.Parameter(torch.zeros(n_heads, *table_hw))
        self.n_keys_hw = n_keys_hw

    def forward(self, query, source, key_grid, q_grid):
        # query (B, C, H, W); source (B, C, Hs, Ws); key_grid (B, hk, wk, 2)
        B, C, H, W = query.shape
        kv = F.grid_sample(source, key_grid, mode="bilinear", align_corners=True)
        k = self.proj_k(kv).reshape(B * self.n_heads, self.ch, -1)
        v = self.proj_v(kv).reshape(B * self.n_heads, self.ch, -1)
        q = query.reshape(B * self.n_heads, self.ch, H * W)
        attn = torch.einsum("bcm,bcn->bmn", q, k) * self.ch**-0.5

        # full displacement tensor + bias grid_sample (reference strategy)
        n = k.shape[-1]
        disp = (
            q_grid.reshape(1, H * W, 1, 2) - key_grid.reshape(B, 1, n, 2)
        ) * 0.5
        bias = F.grid_sample(
            self.rpe[None].expand(B, -1, -1, -1), disp, mode="bilinear",
            align_corners=True,
        ).reshape(B * self.n_heads, H * W, n)
        attn = torch.softmax(attn + bias, dim=-1)
        out = torch.einsum("bmn,bcn->bcm", attn, v).reshape(B, C, H, W)
        return self.proj_out(out)


def _norm_grid(h, w):
    ys = torch.linspace(-1, 1, h)
    xs = torch.linspace(-1, 1, w)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], -1)  # (h, w, 2) in (x, y)


class EncoderLayer(nn.Module):
    def __init__(self, dim, n_heads, stride, n_views, bev, depth_dim):
        super().__init__()
        self.lpu1 = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)
        self.lpu2 = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)
        self.norm = nn.GroupNorm(1, dim)
        hk = max(bev // stride, 1)
        self.tsa = DenseDeformAttention(
            dim, n_heads, (hk, hk), (2 * bev - 1, 2 * bev - 1)
        )
        self.sca = DenseDeformAttention(
            dim, n_heads, (bev // 2, bev * depth_dim),
            (2 * bev - 1, 2 * bev * depth_dim - 1),
        )
        self.n_views = n_views
        self.mlp = nn.Sequential(
            nn.Conv2d(dim, dim * 4, 1), nn.GELU(), nn.Conv2d(dim * 4, dim, 1)
        )
        self.proj_views = nn.Conv2d(dim * n_views, dim, 1)
        self.bev = bev
        self.hk = hk
        self.depth_dim = depth_dim

    def forward(self, x, img_feats):
        B = x.shape[0]
        qg = _norm_grid(self.bev, self.bev)
        x = x + self.lpu1(x)
        kg = _norm_grid(self.hk, self.hk)[None].expand(B, -1, -1, -1)
        x = x + self.tsa(self.norm(x), x, kg, qg)
        x = x + self.mlp(self.norm(x))
        x = x + self.lpu2(x)
        outs = []
        kg2 = _norm_grid(self.bev // 2, self.bev * self.depth_dim)
        kg2 = kg2[None].expand(B, -1, -1, -1)
        for v in range(self.n_views):  # Python view loop like the reference
            outs.append(self.sca(self.norm(x), img_feats[:, v], kg2, qg))
        x = x + self.proj_views(torch.cat(outs, dim=1))
        x = x + self.mlp(self.norm(x))
        return x


class TorchBEVRender(nn.Module):
    """Flagship-shaped model: ResNet18-style backbone, 7 stages x depth 2,
    uniform BEV 28 width 64, 3 views, render decoder to (3, 224, 224)."""

    def __init__(self, bev=28, dim=64, n_views=3, depth_dim=5):
        super().__init__()
        heads = [2, 4, 8, 16, 8, 4, 2]
        strides = [8, 4, 2, 1, 2, 4, 8]
        self.backbone = nn.Sequential(
            nn.Conv2d(3, 64, 3, 2, 1), nn.GroupNorm(1, 64), nn.ReLU(),
            nn.MaxPool2d(3, 2, 1),
            *[
                nn.Sequential(
                    nn.Conv2d(64, 64, 3, 2 if i == 1 else 1, 1),
                    nn.GroupNorm(1, 64), nn.ReLU(),
                    nn.Conv2d(64, 64, 3, 1, 1), nn.GroupNorm(1, 64), nn.ReLU(),
                )
                for i in range(4)
            ],
        )
        self.stages = nn.ModuleList(
            EncoderLayer(dim, heads[s], strides[s], n_views, bev, depth_dim)
            for s in range(7)
            for _ in range(2)
        )
        self.embedding = nn.Parameter(torch.rand(dim, bev, bev))
        self.decoder = nn.Sequential(
            nn.Conv2d(dim, 64, 7, 2, 3), nn.GroupNorm(1, 64), nn.ReLU(),
            *[
                nn.Sequential(
                    nn.Upsample(scale_factor=2, mode="bilinear"),
                    nn.Conv2d(64, 64, 3, 1, 1), nn.GroupNorm(1, 64), nn.ReLU(),
                )
                for _ in range(4)
            ],
            nn.Conv2d(64, 3, 1), nn.Sigmoid(),
        )
        self.n_views = n_views

    def forward(self, images):
        # images: (B, T, V, 3, H, W); recurrent history like bevrender.py:179-221
        B, T, V = images.shape[:3]
        prev = None
        for t in range(T):
            feats = self.backbone(images[:, t].reshape(B * V, *images.shape[3:]))
            feats = feats.reshape(B, V, *feats.shape[1:])
            x = self.embedding[None].expand(B, -1, -1, -1)
            for stage in self.stages:
                x = stage(x, feats)
            prev = x
        return self.decoder(prev)


def measure_stages(reps: int = 3, T: int = 2) -> dict:
    """Per-stage timings for the BASELINE.json measurement matrix
    (BASELINE.md "Measurement plan"): 1 backbone-only, 2 proj+SCA,
    3 TSA sequence, 4 encoder+decoder render. (5, end-to-end, is
    ``measure``.) Median-of-reps wall ms, eval mode, no_grad."""
    model = TorchBEVRender().eval()
    out = {}

    def med(fn, n=reps):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] * 1e3

    with torch.no_grad():
        # 1. img_backbone CNN, single ground-camera frame, batch=1
        frame = torch.randn(1, 3, 224, 224)
        model.backbone(frame)  # warm
        out["backbone_1frame_ms"] = med(lambda: model.backbone(frame))

        # 2. camera->BEV projection + SCA, single timestep (3 views)
        stage = model.stages[0]
        x = model.embedding[None]
        feats = torch.randn(1, 3, 64, 28, 28)
        kg2 = _norm_grid(stage.bev // 2, stage.bev * stage.depth_dim)
        kg2 = kg2[None]
        qg = _norm_grid(stage.bev, stage.bev)

        def sca_views():
            for v in range(3):
                stage.sca(stage.norm(x), feats[:, v], kg2, qg)

        sca_views()
        out["proj_sca_1layer_3views_ms"] = med(sca_views)

        # 3. TSA over a T-frame BEV query sequence
        kg = _norm_grid(stage.hk, stage.hk)[None]

        def tsa_seq():
            for _ in range(T):
                stage.tsa(stage.norm(x), x, kg, qg)

        tsa_seq()
        out["tsa_seq_T%d_ms" % T] = med(tsa_seq)

        # 4. full encoder -> decoder render, single timestep
        feats_v = torch.randn(1, 3, 64, 28, 28)

        def enc_dec():
            h = model.embedding[None]
            for s in model.stages:
                h = s(h, feats_v)
            model.decoder(h)

        enc_dec()
        out["encoder_decoder_1t_ms"] = med(enc_dec, n=1)
    return out


def measure(frames: int = 2, T: int = 2):
    """Per-frame render+register wall times; headline fps = 1/median.

    Median over >=20 frames (VERDICT r3 item 10) is robust to scheduler
    noise in either direction, unlike the old best-of-total-runs number.
    Returns (fps_median, per_frame_seconds).
    """
    model = TorchBEVRender().eval()
    images = torch.randn(1, T, 3, 3, 224, 224)
    tiles = torch.nn.functional.normalize(torch.randn(64, 3 * 224 * 224), dim=-1)
    times = []
    with torch.no_grad():
        for _ in range(frames):
            t0 = time.perf_counter()
            out = model(images)
            emb = torch.nn.functional.normalize(out.flatten(1), dim=-1)
            d = 2 - 2 * emb @ tiles.T  # register against tile DB
            d.argmin()
            times.append(time.perf_counter() - t0)
    import statistics

    return 1.0 / statistics.median(times), times


def measure_train_step(steps: int = 1, B: int = 2, T: int = 2) -> float:
    """Wall ms per training step (fwd + bwd + AdamW), the reference regime:
    history frames under no_grad (bevrender.py:124-134), gradient on the
    final frame; MSE render loss + paired-arange contrastive on the
    flattened embeddings (train.py:96-125 MSE_CONTRASTIVE). Pairs with
    bench.py's train_ms_per_step (B=2, T=2)."""
    model = TorchBEVRender().train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-4)
    images = torch.randn(B, T, 3, 3, 224, 224)
    maps = torch.rand(B, 3, 224, 224)

    def views(t):
        f = model.backbone(images[:, t].reshape(B * 3, 3, 224, 224))
        return f.reshape(B, 3, *f.shape[1:])

    def step():
        opt.zero_grad()
        with torch.no_grad():  # recurrent history, no grads
            feats = views(0)
            x = model.embedding[None].expand(B, -1, -1, -1)
            for stage in model.stages:
                x = stage(x, feats)
        feats = views(T - 1)
        x = model.embedding[None].expand(B, -1, -1, -1)
        for stage in model.stages:
            x = stage(x, feats)
        render = model.decoder(x)
        mse = F.mse_loss(render, maps)
        cam = torch.nn.functional.normalize(render.flatten(1), dim=-1)
        mp = torch.nn.functional.normalize(maps.flatten(1), dim=-1)
        sims = cam @ mp.T
        pos = sims.diagonal()
        neg = sims - torch.eye(B) * 1e9
        contrastive = (1 - pos).clamp(min=0).mean() + neg.clamp(min=0).mean()
        (mse + contrastive).backward()
        opt.step()

    ts = []
    for _ in range(steps):
        t0 = time.perf_counter()
        step()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--stages", action="store_true",
                    help="also measure the 5-config matrix (BASELINE.md)")
    ap.add_argument("--train", action="store_true",
                    help="also measure the B=2 T=2 training step")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "BASELINE_MEASURED.json"))
    args = ap.parse_args()
    torch.set_num_threads(torch.get_num_threads())
    out_path = Path(args.out)
    payload = {}
    if out_path.exists():  # preserve fields written by other tools
        try:
            payload = json.loads(out_path.read_text())
        except json.JSONDecodeError:
            payload = {}
    fps, times = measure(args.frames)
    times_ms = sorted(t * 1e3 for t in times)
    payload.pop("fps_note", None)
    payload.update({
        "torch_cpu_render_register_fps": fps,
        "frames": args.frames,
        "frame_ms_median": round(times_ms[len(times_ms) // 2], 1),
        "frame_ms_min": round(times_ms[0], 1),
        "frame_ms_max": round(times_ms[-1], 1),
        "fps_methodology": "1 / median per-frame wall time",
        "threads": torch.get_num_threads(),
        "timestamp": time.time(),
        "config": "flagship uniform-28 BEVRender, B=1, T=2, 3 views, 224x224",
    })
    if args.stages:
        payload["stages_torch_cpu_ms"] = measure_stages()
    if args.train:
        payload["torch_cpu_train_ms_per_step"] = measure_train_step()
        payload["torch_cpu_train_config"] = "B=2, T=2, MSE+contrastive, AdamW"
    out_path.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
