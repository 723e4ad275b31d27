from hairci.eval.features import extract_features, l2_normalize
from hairci.eval.knn import (knn_eval, knn_predict, knn_predict_multi,
                             format_knn_report, DEFAULT_KS)
from hairci.eval.linear_probe import linear_probe_eval, linear_probe_fit_predict
from hairci.eval.variance import compute_intra_inter_variance
from hairci.eval.umap_export import save_umap, project_2d, pca_2d
from hairci.eval.classifier import Classifier
