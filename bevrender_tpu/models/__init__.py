from bevrender_tpu.models.bevrender import BEVRenderModel, BEVRenderNet
from bevrender_tpu.models.encoder import BEVEncoder, BEVEncoderStage, EncoderLayer
from bevrender_tpu.models.attention import SCADeformableAttention, TSADeformableAttention
from bevrender_tpu.models.backbone import (
    ResNet18WoFPN, PatchProjection, ResnetFPN, build_backbone,
)
from bevrender_tpu.models.decoder import BEVImageRenderDecoder, SimpleDecoder
