"""mlforecast_spark: a PySpark-native panel feature-engineering + forecasting
engine with the query/data-processing capabilities of Nixtla/mlforecast.

The panel is one distributed DataFrame; every feature is a Column over a
window; pooled features are agg→window→join plans; models train via
distributed sufficient statistics and score as JVM expressions.
"""

from .forecast import MLForecast
from .core import FeaturePlan, PanelSchema
from .joins import asof_join, range_join
from .local_predict import CogroupUnsupportedError
from .preprocessing import fill_gaps
from . import lag_transforms, target_transforms, models, utils

__version__ = "0.1.0"

__all__ = [
    "MLForecast",
    "FeaturePlan",
    "PanelSchema",
    "CogroupUnsupportedError",
    "asof_join",
    "range_join",
    "fill_gaps",
    "lag_transforms",
    "target_transforms",
    "models",
    "utils",
]
