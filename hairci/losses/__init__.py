from hairci.losses.contrastive import (
    nt_xent_loss,
    nt_xent_1anchor_2positive,
    supcon_loss,
    triplet_margin_loss,
    positive_consistency_loss_margin,
    bidirectional_margin_loss,
    mse_alignment_loss,
    margin_violation_stats,
)
from hairci.losses.distill import (
    negative_cosine_similarity,
    distillation_loss,
    dino_loss,
    ibot_patch_loss,
    koleo_loss,
    msn_loss,
)
from hairci.losses.dense import (
    dense_loss,
    patch_contrastive_loss,
    memory_bank_infonce,
    update_memory_bank,
    select_most_similar,
)
from hairci.losses.ranking import s2r2_loss
from hairci.losses.recon import (
    patchify,
    unpatchify,
    masked_mse_loss,
    masked_l1_loss,
    unigrad_loss,
)
