"""AI/LLM function family: ai_classify / ai_sentiment / ai_extract /
ai_summarize / ai_translate / ai_mask / ai_similarity / embed.

Reference: 14 impls under be/src/exprs/function/ai/ (ai_classify.h,
embed.h, ...) with resource-based endpoint config (ai_adapter.h) and the
ai_agg aggregate (aggregate_function_ai_agg.h).

Spark-first design: each function is an Arrow-batched pandas UDF whose
batch body calls a pluggable `AIAdapter`. In production the adapter POSTs
the whole Arrow batch to an inference endpoint (one RPC per ~10k rows,
not per row); executors run batches in parallel so throughput scales with
the cluster, and failures stay inside the task retry boundary.

No inference endpoint exists in this container, so the default adapter is
`DeterministicFakeAdapter` — md5-seeded, stable across runs and engines —
which keeps every pipeline testable end-to-end. Swap the adapter via
`set_adapter()` (module-level, captured at UDF definition time on the
driver and shipped in the closure).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType, StringType


class AIAdapter:
    """Endpoint interface. Batch in, batch out — never per-row."""

    def classify(self, texts: Sequence[str], labels: Sequence[str]) -> list[str]:
        raise NotImplementedError

    def sentiment(self, texts: Sequence[str]) -> list[str]:
        raise NotImplementedError

    def generate(self, prompts: Sequence[str]) -> list[str]:
        raise NotImplementedError

    def similarity(self, a: Sequence[str], b: Sequence[str]) -> list[float]:
        raise NotImplementedError

    def embed(self, texts: Sequence[str], dim: int) -> list[list[float]]:
        raise NotImplementedError


class DeterministicFakeAdapter(AIAdapter):
    """md5-seeded stand-in: deterministic, dependency-free, shaped exactly
    like a real endpoint response. NOT a model — a test double."""

    def _h(self, text: str, salt: str = "") -> int:
        d = hashlib.md5((salt + (text or "")).encode()).digest()
        (u,) = struct.unpack(">Q", d[:8])
        return u

    def classify(self, texts, labels):
        labels = list(labels)
        return [labels[self._h(t, "cls") % len(labels)] for t in texts]

    def sentiment(self, texts):
        return self.classify(texts, ["positive", "neutral", "negative"])

    def generate(self, prompts):
        return [f"[gen:{hashlib.md5((p or '').encode()).hexdigest()[:12]}]" for p in prompts]

    def similarity(self, a, b):
        out = []
        for x, y in zip(a, b):
            sa, sb = set((x or "").lower().split()), set((y or "").lower().split())
            union = sa | sb
            out.append(len(sa & sb) / len(union) if union else 0.0)
        return out

    def embed(self, texts, dim):
        vecs = []
        for t in texts:
            v = []
            for i in range(dim):
                u = self._h(t, f"emb{i}")
                v.append((u / float(1 << 64)) * 2.0 - 1.0)
            vecs.append(v)
        return vecs


_adapter: AIAdapter = DeterministicFakeAdapter()


def set_adapter(adapter: AIAdapter) -> None:
    global _adapter
    _adapter = adapter


def ai_classify(col, labels: Sequence[str]) -> Column:
    adapter, labels = _adapter, list(labels)

    @F.pandas_udf(StringType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series(adapter.classify(s.tolist(), labels))

    return _f(col)


def ai_sentiment(col) -> Column:
    adapter = _adapter

    @F.pandas_udf(StringType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series(adapter.sentiment(s.tolist()))

    return _f(col)


def ai_generate(col) -> Column:
    adapter = _adapter

    @F.pandas_udf(StringType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series(adapter.generate(s.tolist()))

    return _f(col)


def ai_summarize(col) -> Column:
    """Summarize = generate with a summary prompt prefix (reference
    ai_summarize.h wraps the same endpoint)."""
    c = F.col(col) if isinstance(col, str) else col
    return ai_generate(F.concat(F.lit("summarize: "), c))


def ai_translate(col, target_lang: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return ai_generate(F.concat(F.lit(f"translate[{target_lang}]: "), c))


def ai_fixgrammar(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return ai_generate(F.concat(F.lit("fixgrammar: "), c))


def ai_mask(col, kinds: Sequence[str] = ("email", "phone")) -> Column:
    """PII masking — regex-based (deterministic core; an LLM adapter can
    replace it for free-form PII)."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    if "email" in kinds:
        out = F.regexp_replace(out, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    if "phone" in kinds:
        out = F.regexp_replace(out, r"\+?\d[\d\s().-]{7,}\d", "<PHONE>")
    return out


def ai_similarity(a, b) -> Column:
    adapter = _adapter

    @F.pandas_udf(DoubleType())
    def _f(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(adapter.similarity(sa.tolist(), sb.tolist()))

    return _f(a, b)


def ai_filter(col, predicate_prompt: str) -> Column:
    """Boolean LLM filter — classify into yes/no."""
    c = F.col(col) if isinstance(col, str) else col
    return ai_classify(F.concat(F.lit(predicate_prompt + ": "), c), ["yes", "no"]) == "yes"


def embed(col, dim: int = 16) -> Column:
    adapter, d = _adapter, dim

    @F.pandas_udf(ArrayType(FloatType()))
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series(adapter.embed(s.tolist(), d))

    return _f(col)


def ai_agg(df, group_cols: Sequence[str], text_col: str, prompt: str = "summarize"):
    """ai_agg (aggregate_function_ai_agg.h): ONE model call per group over
    the gathered member texts. Two-phase: the wide shuffle carries only the
    collect_list partial states; the LLM batch call runs over the (small)
    grouped table — at scale that's |groups| calls, never |rows|."""
    joined = F.array_join(F.array_sort(F.collect_list(text_col)), "\n")
    g = df.groupBy(*group_cols).agg(joined.alias("__joined"))
    return g.select(
        *group_cols,
        ai_generate(F.concat(F.lit(prompt + ":"), F.col("__joined"))).alias("ai_agg"),
    )


def register(spark) -> int:
    """SQL-callable registrations of the AI family (the reference resolves
    these to an AI resource endpoint, ai_adapter.h; here the session
    adapter). Labels/kinds arrive as comma-separated strings at the SQL
    surface since Doris passes them as varchar literals too."""
    adapter = _adapter
    n = 0

    def reg(name, fn, ret):
        nonlocal n
        spark.udf.register(name, F.pandas_udf(fn, ret))
        n += 1

    def _classify(s: pd.Series, labels: pd.Series) -> pd.Series:
        out = []
        for text, lab in zip(s, labels):
            out.append(adapter.classify([text], (lab or "").split(","))[0])
        return pd.Series(out)

    reg("ai_classify", _classify, "string")
    reg("ai_extract", _classify, "string")

    reg("ai_sentiment", lambda s: pd.Series(adapter.sentiment(s.tolist())), "string")
    reg("ai_generate", lambda s: pd.Series(adapter.generate(s.tolist())), "string")
    reg(
        "ai_summarize",
        lambda s: pd.Series(adapter.generate([f"summarize: {t}" for t in s.tolist()])),
        "string",
    )

    def _translate(s: pd.Series, lang: pd.Series) -> pd.Series:
        return pd.Series(
            adapter.generate([f"translate[{g}]: {t}" for t, g in zip(s, lang)])
        )

    reg("ai_translate", _translate, "string")
    reg(
        "ai_fixgrammar",
        lambda s: pd.Series(adapter.generate([f"fixgrammar: {t}" for t in s.tolist()])),
        "string",
    )

    def _mask(s: pd.Series, kinds: pd.Series) -> pd.Series:
        import re as _re

        out = []
        for text, k in zip(s, kinds):
            masked = text
            ks = (k or "email,phone").split(",")
            if masked is not None:
                if "email" in ks:
                    masked = _re.sub(r"[\w.+-]+@[\w-]+\.[\w.]+", "[MASKED]", masked)
                if "phone" in ks:
                    masked = _re.sub(r"\+?\d[\d\s().-]{7,}\d", "[MASKED]", masked)
            out.append(masked)
        return pd.Series(out)

    reg("ai_mask", _mask, "string")

    def _similarity(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(adapter.similarity(a.tolist(), b.tolist()))

    reg("ai_similarity", _similarity, "double")

    def _filter(s: pd.Series, prompt: pd.Series) -> pd.Series:
        sims = adapter.similarity(s.tolist(), prompt.tolist())
        return pd.Series([v >= 0.5 for v in sims])

    reg("ai_filter", _filter, "boolean")

    def _embed(s: pd.Series) -> pd.Series:
        return pd.Series(adapter.embed(s.tolist(), 16))

    reg("embed", _embed, "array<float>")

    # ai_agg: grouped aggregate (one endpoint call per group) — usable in
    # SQL GROUP BY; Series -> scalar type hints make this a GROUPED_AGG
    # pandas UDF
    @F.pandas_udf("string")
    def _ai_agg(texts: pd.Series) -> str:
        joined = " | ".join(t for t in texts.tolist() if t)
        return adapter.generate([f"agg: {joined}"])[0]

    spark.udf.register("ai_agg", _ai_agg)
    n += 1
    return n
