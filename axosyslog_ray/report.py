"""Corpus profiling: the one-call "corpus card" a dataset release ships
with (doc/token counts, token-length quantiles, language mix, exact-dup
rate — the summary table of public dataset cards like C4/Dolma/RefinedWeb
datasheets).

Shape: ONE map pass projects each doc to a narrow (lang, n_tok,
text_hash) row; that tiny projection materializes once and feeds three
bounded consumers — a language groupby (cardinality = languages), a
distinct-count over 8-byte text hashes (the exact-dup rate), and the
token-length quantiles. Document text itself never shuffles and never
sits on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def corpus_report(ds, text_col: str = "text", lang_col: str = "lang",
                  quantiles: dict[str, float] | None = None) -> pd.DataFrame:
    """Profile a documents Dataset into a small (metric, value) frame:
    n_docs, total_tokens, distinct_texts (64-bit-hash exact-dup
    estimate, SQL count(DISTINCT text) modulo collisions), token-count
    quantiles, and one `lang:<x>` row per language. SQL-reproducible
    (docs_corpus_report)."""
    from .hashutil import hash_str_array
    from .textstats.vocab import _flat_tokens
    from .window import group_quantiles

    quantiles = quantiles or {"p50_tokens": 0.5, "p90_tokens": 0.9}

    def project(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
        _toks, seg = _flat_tokens(texts)
        n_tok = np.diff(seg).astype(np.int64)
        th = hash_str_array(texts).view(np.int64)
        lang = (b.column(lang_col) if lang_col in b.column_names
                else pa.array(["und"] * b.num_rows, type=pa.string()))
        return pa.table({"lang": lang, "n_tok": pa.array(n_tok),
                         "th": pa.array(th)})

    narrow = ds.map_batches(project, batch_format="pyarrow").materialize()

    by_lang = narrow.groupby("lang").count().to_pandas()
    tok_sum = narrow.groupby("lang").sum("n_tok").to_pandas()
    n_docs = int(by_lang["count()"].sum())
    total_tokens = int(tok_sum["sum(n_tok)"].sum())
    distinct_texts = narrow.groupby("th").count().count()
    q = group_quantiles(
        narrow.map_batches(
            lambda b: b.append_column("_one", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        "_one", "n_tok", quantiles).to_pandas()

    rows = [("n_docs", float(n_docs)),
            ("total_tokens", float(total_tokens)),
            ("distinct_texts", float(distinct_texts))]
    for name in quantiles:
        rows.append((name, float(q[name].iloc[0])))
    for _, r in by_lang.iterrows():
        rows.append((f"lang:{r['lang']}", float(r["count()"])))
    out = pd.DataFrame(rows, columns=["metric", "value"])
    return out.sort_values("metric").reset_index(drop=True)
