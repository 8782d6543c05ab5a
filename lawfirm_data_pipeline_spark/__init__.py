"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (fahad-islam/lawfirm-data-pipeline).

Built Spark-first: the logical plan is declared with the DataFrame / Spark
SQL API and Catalyst + Tungsten pick the physical strategy.  Nothing here
is a port of the reference's Effect-TS/Prisma architecture — see SURVEY.md
for the capability mapping (reference file:line → Spark primitive).

Layout:
    session     — SparkSession builder tuned for local[N] test runs
    schemas     — explicit StructTypes for every table (no inference)
    io          — parquet read helpers for the driver test tables
    predicates  — the Prisma filter vocabulary as composable Columns (§2.B)
    query       — find_first/find_many/count/aggregate/group_by (§2.B)
    operators/  — relations, mutations, dedup, similarity, text analysis
    pipeline/   — the three reference pipeline stages as batch transforms
    streaming/  — Structured Streaming equivalents of the queue pollers
"""

__version__ = "0.1.0"
