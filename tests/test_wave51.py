"""Fixture test for the wave-51 (round 8) exact ROC AUC — a
constructed corpus with an identical-text pair straddling the label
boundary (a cross-label tie group, the case average ranks exist for),
checked against an independent pure-Python reference: hashlib-md5
token weights + the textbook average-rank Mann-Whitney AUC.
"""

from __future__ import annotations

import hashlib


def _py_logit(text: str) -> int:
    w = 0
    for t in text.strip().split():
        h = int(hashlib.md5(t.lower().encode()).hexdigest()[:15], 16)
        w += h % 2001 - 1000
    return w


def _py_auc(pairs):
    """(score, label) pairs -> (rank_sum_pos_x2, u_x2, auc)."""
    s = sorted(pairs)
    # average ranks doubled, per tie group
    ranks_x2 = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j][0] == s[i][0]:
            j += 1
        ranks_x2[s[i][0]] = (i + 1) + j  # 2 * (i+1 + j) / 2
        i = j
    n_pos = sum(l for _, l in pairs)
    n_neg = len(pairs) - n_pos
    r_pos_x2 = sum(ranks_x2[sc] for sc, l in pairs if l)
    u_x2 = r_pos_x2 - n_pos * (n_pos + 1)
    return r_pos_x2, u_x2, u_x2 / (2.0 * n_pos * n_neg)


def test_roc_auc_matches_python_reference_with_ties(spark):
    from etl_neotel_sql_automation_spark.workload.wave51 import roc_auc_frame

    texts = [
        ("alpha beta gamma", "en"),
        ("alpha beta gamma", "fr"),  # exact tie with the row above
        ("delta epsilon", "en"),
        ("zeta", "de"),
        ("eta theta iota kappa", "en"),
        ("lambda mu", "es"),
    ]
    docs = spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, (t, lang) in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    [row] = roc_auc_frame(docs).collect()
    pairs = [(_py_logit(t), 1 if lang == "en" else 0) for t, lang in texts]
    r_pos_x2, u_x2, auc = _py_auc(pairs)
    assert row["n_docs"] == 6
    assert row["n_pos"] == 3 and row["n_neg"] == 3
    assert row["rank_sum_pos_x2"] == r_pos_x2
    assert row["u_stat_x2"] == u_x2
    assert row["auc"] == round(auc, 6)
    assert row["gini"] == round(2 * auc - 1, 6)


def test_roc_auc_perfect_and_reversed_ranking(spark):
    """Axiomatic endpoints on controlled scores: when every positive
    outranks every negative AUC = 1; fully reversed AUC = 0 — driven
    through the same frame by picking single-token texts whose hashed
    weights are computed first, then assigning labels by score sign."""
    from etl_neotel_sql_automation_spark.workload.wave51 import roc_auc_frame

    toks = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    scored = sorted((_py_logit(t), t) for t in toks)
    # top half of the ranking labelled en -> perfect separation
    docs = spark.createDataFrame(
        [
            (i, t, "en" if i >= 3 else "fr", "src0", len(t))
            for i, (_, t) in enumerate(scored)
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    [row] = roc_auc_frame(docs).collect()
    assert row["auc"] == 1.0 and row["gini"] == 1.0
    # bottom half labelled en -> fully reversed
    docs2 = spark.createDataFrame(
        [
            (i, t, "en" if i < 3 else "fr", "src0", len(t))
            for i, (_, t) in enumerate(scored)
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    [row2] = roc_auc_frame(docs2).collect()
    assert row2["auc"] == 0.0 and row2["gini"] == -1.0
