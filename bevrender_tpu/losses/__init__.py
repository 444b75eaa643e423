from bevrender_tpu.losses.rendering import (
    MSELoss, L1Loss, CrossEntropyLoss, mse_loss, l1_loss, cross_entropy_loss,
)
from bevrender_tpu.losses.metric import (
    ContrastiveLoss, TripletLossMetricLearning, LiftedStructureLoss,
    contrastive_loss, triplet_loss, lifted_structure_loss,
)
from bevrender_tpu.losses.recall import recall_at_k, recall_curve
