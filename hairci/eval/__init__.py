from hairci.eval.features import extract_features, l2_normalize
from hairci.eval.knn import knn_eval, knn_predict, format_knn_report, DEFAULT_KS
