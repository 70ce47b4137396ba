"""User-defined aggregate (pandas grouped-agg) and table (UDTF)
functions — the §2.8 surface the reference never needed (its one UDF is
the scalar gender guess, `scripts/script_api_apify_to_spark.py:18-69`)
but a complete engine exposes.

Both are the SLOW path relative to built-in expressions and exist here
(a) as working templates for semantics Catalyst can't express and
(b) with parity tests proving they equal the built-in formulation, the
same discipline as the gender UDF's native/pandas_udf twin
(`functions/gender.py`).

- ``weighted_avg_udaf``: Arrow-batched grouped aggregation
  (one pandas Series pair per group per batch) — the UDAF template.
  NB pandas_udf return-type hints break under
  ``from __future__ import annotations``; the returnType is passed
  explicitly and the inner function carries no hints.
- ``word_ngrams`` UDTF: a table function yielding (pos, ngram) rows
  per input string — the generator template; registered for SQL
  ``LATERAL`` use. Arrow-optimized eval.
"""

from __future__ import annotations

from pyspark.sql.functions import PandasUDFType, pandas_udf, udtf


def make_weighted_avg_udaf():
    """Grouped-agg pandas UDF: sum(v*w)/sum(w) per group."""
    def _wavg(v, w):
        num = float((v * w).sum())
        den = float(w.sum())
        return num / den if den else float("nan")
    return pandas_udf(_wavg, returnType="double",
                      functionType=PandasUDFType.GROUPED_AGG)


@udtf(returnType="pos int, ngram string")
class word_ngrams:
    """UDTF: all word n-grams of a whitespace-tokenized string, with
    0-based positions. ``SELECT * FROM word_ngrams('a b c', 2)`` ->
    (0, 'a b'), (1, 'b c')."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n < 1:
            return
        words = [w for w in text.split() if w]
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i:i + n])
