"""Property test: line_dedup vs a brute-force Python model over random
corpora — random line vocabularies force cross-doc collisions, empty
lines, whitespace-only lines, and docs that dedup to nothing. The
model is the spec: count trimmed non-empty lines corpus-wide, drop
every occurrence of any line seen >= 2 times, rebuild in order."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mktd6_flink_spark.functions import text as tx

# small line vocabulary => real cross-document collisions
line_strategy = st.sampled_from(
    ["alpha", "beta", "gamma", "  alpha  ", "", "   ", "delta five"])
doc_strategy = st.lists(line_strategy, min_size=0, max_size=6)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8)


def model(corpus):
    trimmed = [[ln.strip() for ln in doc] for doc in corpus]
    counts = Counter(ln for doc in trimmed for ln in doc if ln != "")
    out = {}
    for i, doc in enumerate(trimmed):
        nonempty = [ln for ln in doc if ln != ""]
        kept = [ln for ln in nonempty if counts[ln] < 2]
        out[i] = (len(nonempty), len(kept), "\n".join(kept))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy)
def test_line_dedup_matches_bruteforce(spark, corpus):
    rows = [(i, "\n".join(doc)) for i, doc in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_kept, r.text_clean)
           for r in tx.line_dedup(df).collect()}
    assert got == model(corpus)
