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
