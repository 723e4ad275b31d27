from hairci.ops.topk_pallas import topk_gallery_search
from hairci.ops.rotate_pallas import rotate_shear_pallas

__all__ = ["topk_gallery_search", "rotate_shear_pallas"]
