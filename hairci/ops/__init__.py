from hairci.ops.topk_pallas import topk_gallery_search
