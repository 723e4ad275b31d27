"""DualViewHair experiment — TPU rebuild of
`/root/reference/experiments/DualViewHair/` (SURVEY.md §2.4): teacher(hair-
only)/student(full-image) dual-view contrastive learning + enhanced encoders
+ quantitative retrieval evaluation."""

from hairci.experiments.dualview.models import (
    HairstyleEncoder,
    DualViewHairModel,
    contrastive_loss,
    HairstyleRetrievalModel,
)
from hairci.experiments.dualview.losses import (
    ntxent_loss_symmetric,
    asymmetric_ntxent_loss,
    MomentumQueue,
)
