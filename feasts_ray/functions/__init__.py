"""Pure vector->scalars / vector->vector kernels + feature registry.

These NumPy kernels are the single source of truth for feature math: the
Ray stages (groupby.map_groups / list-column map_batches) and the oracle
both call them, mirroring how the reference's feature functions are pure
vector reducers dispatched by fabletools (/root/reference/R/zzz.R:2-25).
"""

from .registry import FEATURES, feature_set, register_feature  # noqa: F401
from . import features  # noqa: F401  (imports register the features)
