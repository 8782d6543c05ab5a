"""Oracle-checked query registrations, one module per milestone."""

from . import m0_flagship  # noqa: F401
from . import m1_query_layer  # noqa: F401
from . import m2_relations  # noqa: F401
from . import m3_mutations  # noqa: F401
from . import m4_scalar  # noqa: F401
from . import m5_streaming  # noqa: F401
from . import m6_text  # noqa: F401
from . import m6_dedup  # noqa: F401
from . import m6_similarity  # noqa: F401
from . import m7_analytics  # noqa: F401
from . import m8_training_ops  # noqa: F401
from . import m9_raw_sql  # noqa: F401
from . import m10_profiling  # noqa: F401
from . import m11_sql_kit  # noqa: F401
from . import m12_graph_timeseries  # noqa: F401
