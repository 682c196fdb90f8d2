"""Composable DataFrame operators mirroring the reference's QPU classes.

Reference operator inventory (internal/libqpu/types.go:75-93):
DBDriver (scan) | Sum | Join | Index | InMemIndex | Cache | Router.
Each module here implements one class's semantics as a pure DataFrame
transform; the "deployed topology" of the reference becomes plain function
composition over DataFrames.
"""

from proteus_spark.operators.filters import (  # noqa: F401
    eq,
    range_pred,
    is_null,
    is_not_null,
    and_all,
    apply_predicates,
)
from proteus_spark.operators.aggregate import (  # noqa: F401
    agg_view,
    salted_sum_view,
    sum_view,
)
from proteus_spark.operators.join import keyed_merge_join, salted_join  # noqa: F401
from proteus_spark.operators.topk import topk  # noqa: F401
from proteus_spark.operators.router import union_router  # noqa: F401
from proteus_spark.operators.index import RangeIndex  # noqa: F401
from proteus_spark.operators.bucketing import (  # noqa: F401
    drop_bucketed,
    materialize_bucketed,
)
