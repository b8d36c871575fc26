from . import models  # noqa: F401  (register evaluator models)
from . import s2g_fid  # noqa: F401  (registers VAESKConv)
from .evaluators import (BaseEvaluator, DiversityEvaluator, FIDEvaluator,
                         MatchingScoreEvaluator, MultiModalityEvaluator,
                         PrecisionEvaluator, build_evaluator, build_evaluator_model)
from .metrics import (calculate_activation_statistics, calculate_diversity,
                      calculate_frechet_distance, calculate_multimodality,
                      calculate_top_k, euclidean_distance_matrix,
                      get_metric_statistics)
