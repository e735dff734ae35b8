from .ranking import build_ranking  # noqa: F401
from .feature_store import (  # noqa: F401
    FeatureSource,
    HBMFeatureSource,
    TieredFeatureSource,
)
from .presample import presample_ranking  # noqa: F401
