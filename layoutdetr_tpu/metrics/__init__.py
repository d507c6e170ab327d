from layoutdetr_tpu.metrics.layout_metrics import (  # noqa: F401
    convert_xywh_to_ltrb,
    compute_overlap,
    compute_alignment,
    generalized_iou_loss,
    compute_iou,
    compute_docsim_weight,
    masked_mse,
    masked_cross_entropy,
)
