"""Shared oracle-SQL fragments (no registrations — import-order neutral)."""

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

# Brute-force cosine top-10 over embeddings for the 8 fixed queries —
# the oracle for every exhaustive-mode ANN gate (q38b, q69): identical
# derivation to q36 at k=10.
BRUTE_FORCE_TOP10_SQL = f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
         scored AS (
            SELECT q.query_id, c.vec_id,
                   {_COS.format(a='q.qv', b='c.v')} AS score
            FROM c CROSS JOIN q WHERE c.vec_id != q.query_id
         ),
         ranked AS (
            SELECT query_id, vec_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rank
            FROM scored
         )
    SELECT query_id, vec_id, round(score, 6) AS score, rank
    FROM ranked WHERE rank <= 10
"""
