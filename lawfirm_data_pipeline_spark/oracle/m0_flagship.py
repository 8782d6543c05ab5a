"""M0 — the flagship pricing summary (SURVEY.md §7 M0)."""

from ..plans.pricing_summary import PRICING_SUMMARY_SQL, pricing_summary
from ..queries import query

query("q01_pricing_summary", PRICING_SUMMARY_SQL)(pricing_summary)
