"""Tests for text analysis functions and the textops table operators.

Oracle lane: DuckDB over the same parquet (mirrors the driver's
CORRECTNESS check at sf=0.01; here we use sf0.001 for speed).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from rensa_ray.functions.simhash import hamming_distance, simhash64, simhash_bands
from rensa_ray.functions.textstats import (
    content_hash_u64,
    doc_fingerprints,
    lang_id,
    md5_hex,
    quality_scores,
    token_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _to_table(res) -> pa.Table:
    import pandas as pd
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return res


def assert_matches_sql(res, sql: str, sf_dir: str = SF_DIR):
    """Order-insensitive comparison of a Ray result against DuckDB."""
    tbl = _to_table(res)
    import os

    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        if os.path.exists(f"{sf_dir}/{t}.parquet"):  # planted fixtures may
            con.execute(                             # ship only one table
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute(sql).arrow()
    got_df = tbl.to_pandas()
    want_df = want.to_pandas()
    if len(got_df) == 0 and len(want_df) == 0:
        return  # schema of empties is pinned by __ray_entry__._fin, not here
    assert sorted(got_df.columns) == sorted(want_df.columns), (
        got_df.columns, want_df.columns)
    cols = sorted(got_df.columns)
    got_df = got_df[cols].sort_values(cols).reset_index(drop=True)
    want_df = want_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(got_df) == len(want_df), (len(got_df), len(want_df))
    for c in cols:
        g, w = got_df[c].to_numpy(), want_df[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9)
        else:
            assert (g == w).all(), c


# ---------------------------------------------------------------- functions

def test_md5_matches_duckdb():
    texts = ["hello world", "", "√unicode ⊕ text", "a b  c"]
    want = [duckdb.sql("SELECT md5(?::VARCHAR)", params=[t]).fetchone()[0]
            for t in texts]
    assert md5_hex(texts) == want


def test_token_counts_rules():
    n_tok, n_sh = token_counts(["a b c d", "a b", "", "x"])
    assert n_tok.tolist() == [4, 2, 0, 1]
    # >=3 tokens -> n-2 shingles; shorter docs fall back to unigrams
    assert n_sh.tolist() == [2, 2, 0, 1]


def test_quality_scores_shapes():
    qs = quality_scores(["The quick brown fox", "", "the the the"])
    assert qs["word_count"].tolist() == [4, 0, 3]
    assert qs["stopword_ratio"][2] == 1.0
    assert qs["alnum_ratio"][1] == 0.0


def test_lang_id_heuristic():
    out = lang_id(["the cat is on the mat and it is good",
                   "der hund ist nicht ein problem und die katze",
                   "", "你好世界你好世界你好"])
    assert out[0] == "en" and out[1] == "de"
    assert out[2] == "unk" and out[3] == "zh"


def test_fingerprint_order_sensitive():
    fp = doc_fingerprints(["a b c", "c b a", "a b c", ""])
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]
    assert fp[3] == 0


def test_content_hash_matches_fxhash():
    from rensa_ray.kernels.hashing import fxhash64

    texts = ["abc", ""]
    out = content_hash_u64(texts)
    assert out[0] == fxhash64(b"abc")
    assert out[1] == fxhash64(b"")


# ----------------------------------------------------------------- simhash

def test_simhash_near_dup_properties():
    base = " ".join(f"w{i}" for i in range(200))
    near = " ".join(f"w{i}" for i in range(199)) + " zz"
    far = " ".join(f"v{i}" for i in range(200))
    s = simhash64([base, near, far, ""])
    d_near = hamming_distance(s[:1], s[1:2])[0]
    d_far = hamming_distance(s[:1], s[2:3])[0]
    assert d_near < 8 < d_far
    assert s[3] == 0
    # deterministic
    s2 = simhash64([base, near, far, ""])
    assert (s == s2).all()


def test_simhash_bands_reassemble():
    s = simhash64(["some doc with several words here"])
    bands = simhash_bands(s, num_bands=4)
    w = np.uint64(16)
    rebuilt = np.zeros_like(s)
    for b in range(4):
        rebuilt |= bands[:, b] << (np.uint64(b) * w)
    assert (rebuilt == s).all()
    with pytest.raises(ValueError):
        simhash_bands(s, num_bands=5)


# ------------------------------------------------------- table ops vs SQL

def test_exact_dup_groups_vs_sql(ray_session):
    from rensa_ray.pipelines.textops import exact_dup_groups

    assert_matches_sql(
        exact_dup_groups(SF_DIR),
        """SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id,
                  COUNT(*) AS group_size
           FROM documents GROUP BY md5(text) HAVING COUNT(*) >= 2""")


def test_exact_dedup_kept_vs_sql(ray_session):
    from rensa_ray.pipelines.textops import exact_dedup_kept

    assert_matches_sql(
        exact_dedup_kept(SF_DIR),
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)")


def test_exact_dup_pairs_vs_sql(ray_session):
    from rensa_ray.pipelines.textops import exact_dup_pairs

    assert_matches_sql(
        exact_dup_pairs(SF_DIR),
        """SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM documents a JOIN documents b
             ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id""")


def test_doc_stats_by_lang_vs_sql(ray_session):
    from rensa_ray.pipelines.textops import doc_stats_by_lang

    assert_matches_sql(
        doc_stats_by_lang(SF_DIR),
        """SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
                  ROUND(SUM(n_chars)::DOUBLE / COUNT(*), 6) AS avg_chars
           FROM documents GROUP BY lang""")


def test_top_tokens_vs_sql(ray_session):
    from rensa_ray.pipelines.textops import top_tokens

    assert_matches_sql(
        top_tokens(SF_DIR, k=20),
        """WITH toks AS (
             SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
             FROM documents WHERE trim(text) <> '')
           SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
           ORDER BY cnt DESC, token ASC LIMIT 20""")


def test_doc_token_counts_vs_sql(ray_session):
    from rensa_ray.pipelines.textops import doc_token_counts

    assert_matches_sql(
        doc_token_counts(SF_DIR),
        """SELECT doc_id,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\\s+')) END
                      AS n_tokens,
                  CASE WHEN trim(text) = '' THEN 0
                       WHEN len(string_split_regex(trim(text), '\\s+')) >= 3
                       THEN len(string_split_regex(trim(text), '\\s+')) - 2
                       ELSE len(string_split_regex(trim(text), '\\s+')) END
                      AS n_shingles
           FROM documents""")


def test_events_hourly_vs_sql(ray_session):
    from rensa_ray.pipelines.textops import events_hourly

    assert_matches_sql(
        events_hourly(SF_DIR),
        """SELECT event_type, date_trunc('hour', ts) AS hour,
                  COUNT(*) AS n_events
           FROM events GROUP BY event_type, date_trunc('hour', ts)""")


# -------------------------------------------------------------- metrics (B6)

def test_flag_mismatch_stats():
    from rensa_ray.functions.metrics import flag_mismatch_stats

    s = flag_mismatch_stats([True, False, True, False],
                            [True, True, False, False])
    assert s["n"] == 4 and s["mismatches"] == 2
    assert s["mismatch_rate"] == 0.5
    assert s["a_only"] == 1 and s["b_only"] == 1 and s["both_flagged"] == 1
    import pytest

    with pytest.raises(ValueError):
        flag_mismatch_stats([True], [True, False])


def test_kept_set_jaccard_and_pair_recall():
    from rensa_ray.functions.metrics import dup_pair_recall, kept_set_jaccard

    assert kept_set_jaccard([1, 2, 3], [2, 3, 4]) == 0.5
    assert kept_set_jaccard([], []) == 1.0
    assert dup_pair_recall([(2, 1), (3, 4)], [(1, 2)]) == 1.0
    assert dup_pair_recall([], [(1, 2)]) == 0.0


# ------------------------------------------- round-2 curation additions

def test_doc_repetition_stats_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import doc_repetition_stats

    assert_matches_sql(doc_repetition_stats(SF_DIR),
                       entry.oracle_sql()["doc_repetition_stats"])


def test_doc_repetition_stats_planted(ray_session):
    import ray.data as rd

    from rensa_ray.pipelines import textops

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": ["spam spam spam spam",        # one word repeated
                           "a b c d e",                  # all distinct
                           "",                           # empty
                           "x y x y x y"]})              # alternating bigram
    ds = rd.from_arrow(t)
    # reuse the internal kernel via map_batches path: call the public op on a
    # temp parquet dir
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq

        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = _to_table(textops.doc_repetition_stats(d)).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[0, "dup_word_frac"] == 0.75          # 1 - 1/4
    assert out.loc[0, "top_bigram_frac"] == 1.0          # "spam spam" x3 / 3
    assert out.loc[1, "dup_word_frac"] == 0.0
    assert out.loc[2, "dup_word_frac"] == 0.0 and out.loc[2, "top_bigram_frac"] == 0.0
    # "x y" appears 3 of 5 bigrams
    assert out.loc[3, "top_bigram_frac"] == 3 / 5


def test_hash_sample_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import hash_sample

    assert_matches_sql(hash_sample(SF_DIR, pct=10),
                       entry.oracle_sql()["hash_sample_10pct"])


def test_pack_sequences_invariants(ray_session):
    from rensa_ray.pipelines.pack import pack_sequences

    cap = 256
    out = _to_table(pack_sequences(SF_DIR, capacity=cap)).to_pandas()
    # every doc assigned exactly once
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert len(out) == n_docs
    assert out["doc_id"].is_unique
    # per-pack: capped token sums respect capacity; positions contiguous
    out["capped"] = out["n_bpe_tokens"].clip(upper=cap)
    g = out.sort_values(["pack_id", "pack_pos"]).groupby("pack_id")
    assert (g["capped"].sum() <= cap).all()
    for _, grp in list(g)[:50]:
        assert grp["pack_pos"].tolist() == list(range(len(grp)))
        # pack_id is the first member's doc_id
        assert grp.iloc[0]["doc_id"] == grp.iloc[0]["pack_id"]


def test_near_dedup_keep_best(ray_session):
    import ray.data as rd

    from rensa_ray.pipelines.curate import near_dedup_keep_best
    from rensa_ray.pipelines.dedup import DedupConfig

    base = " ".join(f"tok{i}" for i in range(200))
    longer = base + " " + " ".join(f"extra{i}" for i in range(20))
    texts = [base,                      # doc 0: near-dup, shorter
             longer,                    # doc 1: near-dup, longer -> kept
             "completely different words about gardening and stars " * 5,
             "another unrelated document with its own content entirely " * 5]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    cfg = DedupConfig(num_parts=4, concurrency=None)
    kept = set(_to_table(near_dedup_keep_best(rd.from_arrow(t), cfg))
               ["doc_id"].to_pylist())
    assert 1 in kept and 0 not in kept      # longer near-dup wins
    assert {2, 3} <= kept                   # uniques survive


def test_remove_duplicate_lines(ray_session):
    import ray.data as rd

    from rensa_ray.pipelines.curate import remove_duplicate_lines

    docs = {
        0: "alpha beta\nshared boilerplate\ngamma",
        1: "shared boilerplate\ndelta",            # loses the shared line
        2: "shared boilerplate",                    # all lines dup -> dropped
        3: "unique tail\nalpha beta",               # "alpha beta" dup of doc 0
    }
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())})
    out = _to_table(remove_duplicate_lines(rd.from_arrow(t), num_parts=4))
    got = dict(zip(out["doc_id"].to_pylist(), out["text"].to_pylist()))
    assert got[0] == docs[0]                        # first occurrences all kept
    assert got[1] == "delta"
    assert 2 not in got
    assert got[3] == "unique tail"


def test_text_normalize_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import text_normalize

    assert_matches_sql(text_normalize(SF_DIR),
                       entry.oracle_sql()["text_normalize"])


def test_incremental_dedup_query(ray_session):
    """The streaming lane's driver-contract entry: every doc gets a flag,
    and a doc whose exact text already appeared in the first half is
    flagged."""
    import __ray_entry__ as entry

    out = entry.queries()["incremental_dedup"](SF_DIR).to_pandas()
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert len(out) == n
    assert out["doc_id"].is_unique
    # exact duplicates across the halves must be flagged in the second half
    dups = duckdb.sql(f"""
        WITH d AS (SELECT doc_id, text FROM read_parquet(
            '{SF_DIR}/documents.parquet'))
        SELECT b.doc_id FROM d a JOIN d b
          ON a.text = b.text AND a.doc_id < {n//2} AND b.doc_id >= {n//2}
    """).df()["doc_id"].tolist()
    flagged = set(out[out.is_dup].doc_id)
    assert set(dups) <= flagged


# -------------------------------------------------- PII / decontamination

def test_doc_pii_redact_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import doc_pii_redact

    assert_matches_sql(doc_pii_redact(SF_DIR),
                       entry.oracle_sql()["doc_pii_redact"])


def test_doc_pii_redact_planted(ray_session):
    """Planted emails/phones (the sf corpus has none) — semantics check."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["contact alice.smith+x@example.co.uk or bob@test.io now",
                 "call +1 (555) 123-4567 or 555-987-6543 today",
                 "no pii here at all",
                 "mixed: a@b.com then 12345678901 done"]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = _to_table(textops.doc_pii_redact(d)).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[0, "redacted_text"] == "contact <EMAIL> or <EMAIL> now"
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_phones"] == 0
    assert out.loc[1, "redacted_text"] == "call <PHONE> or <PHONE> today"
    assert out.loc[1, "n_phones"] == 2 and out.loc[1, "n_emails"] == 0
    assert out.loc[2, "redacted_text"] == "no pii here at all"
    assert out.loc[3, "redacted_text"] == "mixed: <EMAIL> then <PHONE> done"
    assert out.loc[3, "n_emails"] == 1 and out.loc[3, "n_phones"] == 1


def test_decontaminate_flags_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import decontaminate_flags

    assert_matches_sql(decontaminate_flags(SF_DIR),
                       entry.oracle_sql()["decontaminate_flags"])


def test_decontaminate_flags_planted(ray_session):
    """A train doc sharing a 5-gram with the eval slice is contaminated;
    short docs fall back to unigram membership (canonical shingler rule)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    eval_text = "the quick brown fox jumps over the lazy dog"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),   # doc 0 = eval (0 % 97 == 0)
        "text": [eval_text,
                 "intro text then the quick brown fox jumps and more",  # shares 5-gram
                 "completely unrelated content about ray data pipelines here",
                 "fox",                                     # unigram hit ("fox" in eval? only if eval short)
                 "quick brown wolf runs far away from here"]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = _to_table(textops.decontaminate_flags(d)).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert set(out.index) == {1, 2, 3, 4}          # eval doc excluded
    assert bool(out.loc[1, "is_contaminated"])     # shared 5-gram
    assert not bool(out.loc[2, "is_contaminated"])
    # eval doc has >= 5 words -> only 5-grams in the eval set, so the
    # single-word train doc ("fox") cannot match
    assert not bool(out.loc[3, "is_contaminated"])
    assert not bool(out.loc[4, "is_contaminated"])


def test_doc_tfidf_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import doc_tfidf

    assert_matches_sql(doc_tfidf(SF_DIR), entry.oracle_sql()["doc_tfidf"])


def test_events_asof_join_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import events_asof_join

    assert_matches_sql(events_asof_join(SF_DIR),
                       entry.oracle_sql()["events_asof_join"])


def test_events_asof_join_planted(ray_session):
    """Edge semantics: ts-equal right row matches (>=), no-prior gives NULL,
    users never see each other's events."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10",   # u1 click, purchase
         "2024-01-01 00:00:10",                          # u2 click at tie-ts
         "2024-01-01 00:00:10",                          # u2 purchase (tie)
         "2024-01-01 00:00:05",                          # u3 purchase, no click
         "2024-01-01 00:00:20", "2024-01-01 00:00:30"])  # u1 click2, purchase2
    t = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2, 3, 1, 1], pa.int64()),
        "event_type": ["click", "purchase", "click", "purchase", "purchase",
                       "click", "purchase"],
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0], pa.float64()),
        "props": ["{}"] * 7})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (_to_table(textops.events_asof_join(d, num_parts=2))
               .to_pandas().set_index("event_id").sort_index())
    assert out.loc[1, "prior_event_id"] == 0          # plain prior
    assert out.loc[3, "prior_event_id"] == 2          # equal-ts right matches
    assert pd.isna(out.loc[4, "prior_event_id"])      # no click for u3
    assert out.loc[6, "prior_event_id"] == 5          # latest, not first


def test_events_range_join_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import events_range_join

    assert_matches_sql(events_range_join(SF_DIR),
                       entry.oracle_sql()["events_range_join"])


def test_events_range_join_planted(ray_session):
    """Window boundaries inclusive at both ends; multiple matches expand;
    other users' events excluded."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00",   # 0 u1 click (exactly 60m before purchase)
         "2024-01-01 00:30:00",   # 1 u1 click (inside)
         "2024-01-01 01:00:00",   # 2 u1 purchase
         "2023-12-31 23:59:59",   # 3 u1 click (61m 1s before -> outside)
         "2024-01-01 00:45:00",   # 4 u2 click (other user)
         "2024-01-01 02:30:00"])  # 5 u1 purchase (no clicks in window)
    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 1], pa.int64()),
        "event_type": ["click", "click", "purchase", "click", "click",
                       "purchase"],
        "value": pa.array([0.0] * 6, pa.float64()),
        "props": ["{}"] * 6})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (_to_table(textops.events_range_join(d, num_parts=2))
               .to_pandas().sort_values(["event_id", "match_event_id"]))
    pairs = list(zip(out["event_id"], out["match_event_id"]))
    assert pairs == [(2, 0), (2, 1)]
    gaps = dict(zip(pairs, out["gap_seconds"]))
    assert gaps[(2, 0)] == 3600.0 and gaps[(2, 1)] == 1800.0


def test_chunk_documents_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import chunk_documents

    assert_matches_sql(chunk_documents(SF_DIR),
                       entry.oracle_sql()["chunk_documents"])


def test_chunk_documents_planted(ray_session):
    """Window/overlap arithmetic: chunks tile the doc, each chunk repeats
    the previous chunk's last `overlap` tokens, short docs emit one chunk."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    import pytest as _pytest

    from rensa_ray.pipelines import textops

    long_doc = " ".join(f"t{i}" for i in range(100))
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": [long_doc, "a b c", "   "]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = (_to_table(textops.chunk_documents(d, max_tokens=10, overlap=4))
               .to_pandas())
    g = out[out.doc_id == 0].sort_values("chunk_id")
    # stride 6; chunks = ceil(max(100-4,1)/6) = 16
    assert g.chunk_id.tolist() == list(range(16))
    assert g.n_tokens.iloc[0] == 10 and g.n_tokens.iloc[-1] == 100 - 15 * 6
    toks0 = g.chunk_text.iloc[0].split()
    toks1 = g.chunk_text.iloc[1].split()
    assert toks0[6:] == toks1[:4]                       # overlap repeats
    # tiling: chunk starts every stride tokens
    assert toks1[0] == "t6"
    # reassembly: first chunk + each chunk's tail after overlap = the doc
    rebuilt = toks0 + sum((c.split()[4:] for c in g.chunk_text.iloc[1:]), [])
    assert rebuilt == long_doc.split()
    short = out[out.doc_id == 1]
    assert len(short) == 1 and short.n_tokens.iloc[0] == 3
    assert (out.doc_id != 2).all()                       # blank doc: no chunks
    with _pytest.raises(ValueError):
        textops.chunk_documents(SF_DIR, max_tokens=8, overlap=8)


def test_top_docs_per_lang_oracle(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import top_docs_per_lang

    assert_matches_sql(top_docs_per_lang(SF_DIR),
                       entry.oracle_sql()["top_docs_per_lang"])


def test_length_percentiles_oracle_and_interpolation(ray_session):
    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import length_percentiles

    assert_matches_sql(length_percentiles(SF_DIR),
                       entry.oracle_sql()["length_percentiles"])
    # planted interpolation check: values 10,20,30,40 → p50 = 25.0
    import os
    import tempfile

    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": ["x"] * 4,
                  "n_chars": pa.array([10, 20, 30, 40], pa.int64())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = textops.length_percentiles(d).to_pandas()
    assert out.loc[0, "p50"] == 25.0
    assert np.isclose(out.loc[0, "p25"], 10 + 0.75 * 10)   # h = 0.75
    assert np.isclose(out.loc[0, "p99"], 30 + 0.97 * 10)   # h = 2.97


def test_doc_compression_ratio(ray_session):
    """Repetitive text compresses far below prose; empties give 0; ratios
    positive and bounded for real docs."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    rng = np.random.default_rng(12)
    prose = " ".join(f"w{v}" for v in rng.integers(0, 5000, 400))
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["spam ham " * 200, prose, ""]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = (_to_table(textops.doc_compression_ratio(d))
               .to_pandas().set_index("doc_id"))
    assert out.loc[0, "compression_ratio"] < 0.05      # boilerplate
    assert out.loc[1, "compression_ratio"] > 0.3       # high-entropy prose
    assert out.loc[0, "compression_ratio"] < out.loc[1, "compression_ratio"]
    assert out.loc[2, "compression_ratio"] == 0.0 and out.loc[2, "raw_bytes"] == 0
    assert out.loc[1, "raw_bytes"] == len(prose.encode())

def test_events_range_join_wide_user_ids(ray_session):
    """user_id >= 2^16 must not collide key ranges (the old packed composite
    silently merged users 0 and 65536); rank-based keys handle any id space."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    # user A = 0, user B = 2^16: under the old (user << 48) packing, B's key
    # range aliased A's at matching ts offsets
    ts = pd.to_datetime(
        ["2024-01-01 00:30:00",   # 0: A click (inside A's window)
         "2024-01-01 01:00:00",   # 1: A purchase
         "2024-01-01 00:40:00",   # 2: B click (inside B's window only)
         "2024-01-01 01:00:00"])  # 3: B purchase
    t = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([0, 0, 1 << 16, 1 << 16], pa.int64()),
        "event_type": ["click", "purchase", "click", "purchase"],
        "value": pa.array([0.0] * 4, pa.float64()),
        "props": ["{}"] * 4})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (_to_table(textops.events_range_join(d, num_parts=1))
               .to_pandas().sort_values(["event_id", "match_event_id"]))
    assert list(zip(out["event_id"], out["match_event_id"])) == [(1, 0), (3, 2)]


def test_events_asof_join_tie_break_is_max_event_id(ray_session):
    """Duplicate (user, ts) right rows: the pinned deterministic tie-break is
    max event_id, matching the oracle's arg_max dedup (plain DuckDB ASOF
    leaves the equal-ts pick unspecified)."""
    import os
    import tempfile

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as entry
    from rensa_ray.pipelines import textops

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:00",  # u1 ties (clicks)
         "2024-01-01 00:00:00",                          # u1 third tie
         "2024-01-01 00:00:05"])                         # u1 purchase
    t = pa.table({
        "event_id": pa.array([7, 3, 5, 9], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": ["click", "click", "click", "purchase"],
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "props": ["{}"] * 4})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (_to_table(textops.events_asof_join(d, num_parts=1))
               .to_pandas().set_index("event_id"))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{d}/events.parquet')")
        want = con.execute(entry.oracle_sql()["events_asof_join"]).df()
    assert out.loc[9, "prior_event_id"] == 7            # max event_id of ties
    assert out.loc[9, "prior_value"] == 1.0             # that same row's value
    assert int(want.loc[0, "prior_event_id"]) == 7      # oracle agrees


def test_length_percentiles_empty_input(ray_session):
    """Zero-row documents table: one row of nulls, not an IndexError."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from rensa_ray.pipelines import textops

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "n_chars": pa.array([], pa.int64())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = textops.length_percentiles(d).to_pandas()
    assert len(out) == 1
    assert out.isna().all(axis=None)

def test_decontaminate_flags_two_table(ray_session):
    """Production shape: eval benchmarks as their OWN table — every training
    row is judged (no id-slice carve-out), the eval gram set is broadcast,
    and custom id/text column names pass through."""
    import ray.data as rd

    from rensa_ray.pipelines import textops

    eval_ds = rd.from_arrow(pa.table({
        "prompt": ["the quick brown fox jumps over the lazy dog",
                   "four score and seven years ago our fathers brought"]}))
    train = pa.table({
        "uid": pa.array([10, 11, 12, 13], pa.int64()),
        "body": ["intro text then the quick brown fox jumps and more",  # hit
                 "completely unrelated content about ray data pipelines",
                 "he said four score and seven years ago our leaders",  # hit
                 "the quick brown fox jumps over the lazy dog"]})       # hit
    out = _to_table(textops.decontaminate_flags(
        train_ds=rd.from_arrow(train), eval_ds=eval_ds,
        id_col="uid", text_col="body",
        eval_text_col="prompt")).to_pandas()
    # the caller's id column name AND dtype pass through (uint64-safe)
    out = out.set_index("uid").sort_index()
    assert set(out.index) == {10, 11, 12, 13}      # no row excluded
    assert bool(out.loc[10, "is_contaminated"])
    assert not bool(out.loc[11, "is_contaminated"])
    assert bool(out.loc[12, "is_contaminated"])
    assert bool(out.loc[13, "is_contaminated"])

def test_decontaminate_flags_two_table_uint64_ids(ray_session):
    """Production id columns (webdedup's fxhash64 uid) are uint64 with
    values >= 2^63; the flag pass must preserve the caller's id dtype
    instead of casting to int64 (which raised ArrowInvalid)."""
    import ray.data as rd

    from rensa_ray.pipelines import textops

    big = (1 << 63) + 5
    train = pa.table({
        "uid": pa.array([big, 7], pa.uint64()),
        "text": ["the quick brown fox jumps over the lazy dog",
                 "completely unrelated content about ray data pipelines"]})
    eval_ds = rd.from_arrow(pa.table({
        "text": ["the quick brown fox jumps over the lazy dog"]}))
    out = _to_table(textops.decontaminate_flags(
        train_ds=rd.from_arrow(train), eval_ds=eval_ds,
        id_col="uid")).to_pandas().set_index("uid").sort_index()
    assert out.index.dtype == np.uint64
    assert bool(out.loc[big, "is_contaminated"])
    assert not bool(out.loc[7, "is_contaminated"])


# ------------------------------------------------- source-level curation ops

def _mk_source_docs(tmp_path):
    import pyarrow.parquet as pq

    texts = ["shared boilerplate page " * 3,   # in A and B (cross-source dup)
             "shared boilerplate page " * 3,
             "only in A once",
             "a-internal dup " * 2,            # twice within A
             "a-internal dup " * 2,
             "unique b doc",
             "",                               # empty text edge
             "shared boilerplate page " * 3]   # third copy, source C
    srcs = ["srcA", "srcB", "srcA", "srcA", "srcA", "srcB", "srcC", "srcC"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dup_stats_by_source_planted(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import dup_stats_by_source

    sf_dir = _mk_source_docs(tmp_path)
    res = dup_stats_by_source(sf_dir).to_pandas().set_index("source")
    # srcA: 4 docs, dups = the shared page + both internal copies = 3
    assert res.loc["srcA", "n_docs"] == 4
    assert res.loc["srcA", "n_dup_docs"] == 3
    assert res.loc["srcB", "n_dup_docs"] == 1   # its shared-page copy
    assert res.loc["srcC", "n_dup_docs"] == 1   # empty text is unique
    assert_matches_sql(dup_stats_by_source(sf_dir),
                       entry.oracle_sql()["dup_stats_by_source"], sf_dir)
    assert_matches_sql(dup_stats_by_source(SF_DIR),
                       entry.oracle_sql()["dup_stats_by_source"])


def test_cross_source_overlap_planted(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import cross_source_overlap

    sf_dir = _mk_source_docs(tmp_path)
    res = cross_source_overlap(sf_dir).to_pandas()
    got = {(r.source_a, r.source_b): r.n_shared_texts
           for r in res.itertuples(index=False)}
    # ONE distinct text shared pairwise among A/B/C; internal dups don't count
    assert got == {("srcA", "srcB"): 1, ("srcA", "srcC"): 1,
                   ("srcB", "srcC"): 1}
    assert_matches_sql(cross_source_overlap(sf_dir),
                       entry.oracle_sql()["cross_source_overlap"], sf_dir)


def test_cross_source_overlap_null_source(ray_session, tmp_path):
    """NULL-source rows are dropped (oracle's a.source < b.source is never
    true for NULL) instead of crashing the object-dtype pair sort."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import cross_source_overlap

    texts = ["shared page", "shared page", "shared page", "solo"]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["srcA", "srcB", None, None], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    res = cross_source_overlap(str(tmp_path)).to_pandas()
    got = {(r.source_a, r.source_b): r.n_shared_texts
           for r in res.itertuples(index=False)}
    assert got == {("srcA", "srcB"): 1}
    assert_matches_sql(cross_source_overlap(str(tmp_path)),
                       entry.oracle_sql()["cross_source_overlap"],
                       str(tmp_path))


def test_doc_token_entropy(ray_session, tmp_path):
    import math

    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import doc_token_entropy

    sf_dir = _mk_source_docs(tmp_path)
    res = doc_token_entropy(sf_dir).to_pandas().set_index("doc_id")
    # empty doc → (0, 0.0)
    assert res.loc[6, "n_tokens"] == 0 and res.loc[6, "entropy"] == 0.0
    # "a-internal dup a-internal dup": 2 distinct tokens, uniform → ln 2
    assert abs(res.loc[3, "entropy"] - math.log(2)) < 1e-6
    # repeated boilerplate keeps entropy of the distinct token set
    assert res.loc[0, "entropy"] == res.loc[1, "entropy"]
    assert_matches_sql(doc_token_entropy(sf_dir),
                       entry.oracle_sql()["doc_token_entropy"], sf_dir)
    assert_matches_sql(doc_token_entropy(SF_DIR),
                       entry.oracle_sql()["doc_token_entropy"])


def test_doc_length_zscore_by_lang(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import doc_length_zscore_by_lang

    sf_dir = _mk_source_docs(tmp_path)
    res = doc_length_zscore_by_lang(sf_dir).to_pandas()
    # population standardization: mean 0, unit variance (all docs are 'en')
    assert abs(res["z"].mean()) < 1e-5
    assert abs((res["z"] ** 2).mean() - 1.0) < 1e-4
    assert_matches_sql(doc_length_zscore_by_lang(sf_dir),
                       entry.oracle_sql()["doc_length_zscore_by_lang"], sf_dir)
    assert_matches_sql(doc_length_zscore_by_lang(SF_DIR),
                       entry.oracle_sql()["doc_length_zscore_by_lang"])


def _mk_lang_docs(tmp_path, texts, langs):
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_doc_dup_ngram_fraction_planted(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import doc_dup_ngram_fraction

    texts = ["a b c d e",   # grams abc bcd cde — abc shared with doc 1
             "a b c x y",   # grams abc bcx cxy
             "p q r s t",   # all unique
             "hello",       # unigram fallback, duplicated in doc 4
             "hello"]
    sf_dir = _mk_lang_docs(tmp_path, texts, ["en"] * 5)
    res = doc_dup_ngram_fraction(sf_dir).to_pandas().set_index("doc_id")
    assert res.loc[0, "n_grams"] == 3 and res.loc[0, "dup_frac"] == 0.333333
    assert res.loc[1, "dup_frac"] == 0.333333
    assert res.loc[2, "dup_frac"] == 0.0
    assert res.loc[3, "n_grams"] == 1 and res.loc[3, "dup_frac"] == 1.0
    assert res.loc[4, "dup_frac"] == 1.0
    assert_matches_sql(doc_dup_ngram_fraction(sf_dir),
                       entry.oracle_sql()["doc_dup_ngram_fraction"], sf_dir)
    assert_matches_sql(doc_dup_ngram_fraction(SF_DIR),
                       entry.oracle_sql()["doc_dup_ngram_fraction"])


def test_doc_idf_rarity_planted(ray_session, tmp_path):
    import math

    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import doc_idf_rarity

    sf_dir = _mk_lang_docs(tmp_path, ["a b", "a c"], ["en", "en"])
    res = doc_idf_rarity(sf_dir).to_pandas().set_index("doc_id")
    want = round(math.log(2.0) / 2, 6)  # idf(a)=ln(1)=0, idf(b|c)=ln 2
    assert res.loc[0, "n_distinct_tokens"] == 2
    assert res.loc[0, "mean_idf"] == want and res.loc[1, "mean_idf"] == want
    assert_matches_sql(doc_idf_rarity(sf_dir),
                       entry.oracle_sql()["doc_idf_rarity"], sf_dir)
    assert_matches_sql(doc_idf_rarity(SF_DIR),
                       entry.oracle_sql()["doc_idf_rarity"])


def test_stratified_sample_by_lang(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import stratified_sample_by_lang

    texts = [f"doc number {i}" for i in range(8)]
    langs = ["en"] * 5 + ["fr"] * 3
    sf_dir = _mk_lang_docs(tmp_path, texts, langs)
    res = stratified_sample_by_lang(sf_dir).to_pandas()
    # min-lang target (3) docs from EVERY language, deterministically
    assert res.groupby("lang").size().to_dict() == {"en": 3, "fr": 3}
    again = stratified_sample_by_lang(sf_dir).to_pandas()
    assert sorted(res["doc_id"]) == sorted(again["doc_id"])
    assert_matches_sql(stratified_sample_by_lang(sf_dir),
                       entry.oracle_sql()["stratified_sample_by_lang"], sf_dir)
    assert_matches_sql(stratified_sample_by_lang(SF_DIR),
                       entry.oracle_sql()["stratified_sample_by_lang"])


def test_top_ngrams_planted(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import top_ngrams

    texts = ["x y z x y z",      # "x y z"×2, "y z x", "z x y"
             "x y z q",          # "x y z", "y z q"
             "so"]               # < 3 tokens → contributes nothing
    sf_dir = _mk_lang_docs(tmp_path, texts, ["en"] * 3)
    res = top_ngrams(sf_dir, k=3).to_pandas()
    assert list(res["ngram"]) == ["x y z", "y z q", "y z x"]  # count, then asc
    assert list(res["cnt"]) == [3, 1, 1]
    assert_matches_sql(top_ngrams(sf_dir, k=3), """
        WITH t AS (
          SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        g AS (
          SELECT unnest(list_transform(
                     generate_series(1, len(w) - 2),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ngram
          FROM t WHERE len(w) >= 3)
        SELECT ngram, COUNT(*) AS cnt FROM g GROUP BY ngram
        ORDER BY cnt DESC, ngram ASC LIMIT 3""", sf_dir)
    assert_matches_sql(top_ngrams(SF_DIR),
                       entry.oracle_sql()["top_ngrams"])


def test_filter_length_band(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import filter_length_band

    texts = ["x" * n for n in (1, 10, 20, 30, 40, 50, 60, 70, 1000)]
    sf_dir = _mk_lang_docs(tmp_path, texts, ["en"] * len(texts))
    res = filter_length_band(sf_dir).to_pandas()
    # p25 = 20, p75 = 60 (quantile_cont over 9 values) — extremes trimmed
    assert sorted(res["n_chars"]) == [20, 30, 40, 50, 60]
    assert_matches_sql(filter_length_band(sf_dir),
                       entry.oracle_sql()["filter_length_band"], sf_dir)
    assert_matches_sql(filter_length_band(SF_DIR),
                       entry.oracle_sql()["filter_length_band"])


def test_dedup_savings(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import dedup_savings

    texts = ["a b c", "a b c", "a b c", "d e", "f"]
    sf_dir = _mk_lang_docs(tmp_path, texts, ["en"] * 5)
    res = dedup_savings(sf_dir).to_pandas().iloc[0]
    assert res["n_docs"] == 5 and res["n_kept"] == 3
    assert res["n_dup_docs"] == 2
    assert res["total_tokens"] == 12 and res["kept_tokens"] == 6
    assert res["savings_frac"] == 0.5
    assert_matches_sql(dedup_savings(sf_dir),
                       entry.oracle_sql()["dedup_savings"], sf_dir)
    assert_matches_sql(dedup_savings(SF_DIR),
                       entry.oracle_sql()["dedup_savings"])


def test_pmi_bigrams(ray_session, tmp_path):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import pmi_bigrams

    # "new york" always adjacent (high PMI); "the" everywhere (low PMI)
    texts = ["the new york times the paper"] * 4 + ["the cat sat the mat"] * 4
    sf_dir = _mk_lang_docs(tmp_path, texts, ["en"] * 8)
    res = pmi_bigrams(sf_dir, k=5, min_count=2).to_pandas()
    # the three always-adjacent pairs share the max PMI; ties break asc
    assert list(res["bigram"][:3]) == ["cat sat", "new york", "york times"]
    assert (res["cnt"] >= 2).all()
    assert_matches_sql(
        pmi_bigrams(sf_dir, k=5, min_count=2),
        entry.oracle_sql()["pmi_bigrams"]
            .replace("bc.cnt >= 5", "bc.cnt >= 2")
            .replace("LIMIT 20", "LIMIT 5"),
        sf_dir)
    assert_matches_sql(pmi_bigrams(SF_DIR),
                       entry.oracle_sql()["pmi_bigrams"])
    # the large-vocab distributed-join path must agree with the broadcast
    # path bit-for-bit (both are oracle-exact)
    import os

    os.environ["RENSA_RAY_PMI_BROADCAST_VOCAB"] = "0"
    try:
        assert_matches_sql(
            pmi_bigrams(sf_dir, k=5, min_count=2),
            entry.oracle_sql()["pmi_bigrams"]
                .replace("bc.cnt >= 5", "bc.cnt >= 2")
                .replace("LIMIT 20", "LIMIT 5"),
            sf_dir)
    finally:
        del os.environ["RENSA_RAY_PMI_BROADCAST_VOCAB"]


def test_heavy_hitter_summary_kernel():
    """Merge/truncate bounds: merged lower counts never exceed true counts,
    true counts never exceed lower+err, and guaranteed-exact flags are
    truthful under adversarial truncation."""
    from rensa_ray.kernels.freq import HeavyHitterSummary

    rng = np.random.default_rng(3)
    for _ in range(50):
        vocab = [f"t{i}" for i in range(30)]
        true: dict[str, int] = {}
        summaries = []
        for _b in range(4):
            toks = rng.choice(vocab, size=int(rng.integers(1, 200)))
            u, c = np.unique(toks, return_counts=True)
            for t, n in zip(u, c):
                true[t] = true.get(t, 0) + int(n)
            summaries.append(HeavyHitterSummary.from_exact_counts(
                8, u.astype(object), c))
        m = summaries[0]
        for s in summaries[1:]:
            m = m.merge(s)
        for t, lo in zip(m.tokens, m.counts):
            assert lo <= true[t] <= lo + m.err
        toks, cnts, exact = m.topk(5)
        ranked = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))
        true_top = {t for t, _ in ranked[:5]}
        for t, flag in zip(toks, exact):
            if flag:  # guaranteed entries must be genuinely top-5
                assert t in true_top


def test_top_tokens_approx_equals_exact(ray_session):
    """With capacity above the vocab, the sketch lane IS the exact lane."""
    from rensa_ray.pipelines.textops import top_tokens, top_tokens_approx

    exact = top_tokens(SF_DIR, k=20).to_pandas()
    approx = top_tokens_approx(SF_DIR, k=20).to_pandas()
    assert list(approx["token"]) == list(exact["token"])
    assert list(approx["cnt"]) == list(exact["cnt"])
    assert approx["exact"].all()


def test_log_bucket_sketch_quantiles(ray_session):
    """Sketch quantiles are within the guaranteed relative error of DuckDB's
    exact quantile_cont, and block-merge == single-pass."""
    import duckdb

    from rensa_ray.kernels.freq import LogBucketSketch
    from rensa_ray.pipelines.textops import events_value_quantiles_approx

    res = events_value_quantiles_approx(SF_DIR).to_pandas().iloc[0]
    want = duckdb.sql(
        f"""SELECT quantile_cont(value, 0.5), quantile_cont(value, 0.9),
                   quantile_cont(value, 0.99)
            FROM read_parquet('{SF_DIR}/events.parquet')""").fetchone()
    for got, exp in zip((res["p50"], res["p90"], res["p99"]), want):
        assert abs(got - exp) / exp <= 0.011, (got, exp)
    # mergeability: two half-sketches == one full sketch, bucket-exact
    rng = np.random.default_rng(5)
    v = rng.exponential(10.0, 5000)
    full = LogBucketSketch().add(v)
    half = LogBucketSketch().add(v[:2500]).merge(LogBucketSketch().add(v[2500:]))
    assert (full.counts == half.counts).all()


def test_line_dedup_rebuilt_vs_sql(ray_session, tmp_path):
    """The registry lane's oracle holds on a MULTI-LINE planted corpus (the
    sf0.01 data is single-line, so the window row only proves round-trip);
    DuckDB's row_number/string_agg formulation matches the two-shuffle
    elect-and-reassemble exactly, including dropped-empty-doc semantics."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    texts = ["alpha beta\nshared boilerplate\ngamma",
             "shared boilerplate\ndelta",
             "shared boilerplate",
             "unique tail\nalpha beta"]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    q = entry.queries()["line_dedup_rebuilt"]
    assert_matches_sql(q(str(tmp_path)),
                       entry.oracle_sql()["line_dedup_rebuilt"],
                       str(tmp_path))
    assert_matches_sql(q(SF_DIR), entry.oracle_sql()["line_dedup_rebuilt"])


def test_top_tokens_approx_multibatch_block(ray_session, tmp_path):
    """Regression: a single-fragment read fuses read→map into one task whose
    per-batch summary outputs COALESCE into one driver block; each summary
    row must still merge independently (counts summed across batches, err
    boundaries preserved) instead of being misread as one summary."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import top_tokens, top_tokens_approx

    # 5000 docs in ONE parquet file → one read task → several 1024-row
    # batches coalesced into one block
    texts = [f"common filler{i % 97}" for i in range(5000)]
    tbl = pa.table({
        "doc_id": pa.array(range(5000), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 5000, pa.string()),
        "source": pa.array(["s"] * 5000, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    exact = top_tokens(str(tmp_path), k=5).to_pandas()
    approx = top_tokens_approx(str(tmp_path), k=5).to_pandas()
    # "common" appears 5000x — counts must be summed across batches
    assert list(approx["token"]) == list(exact["token"])
    assert list(approx["cnt"]) == list(exact["cnt"])
    assert approx["cnt"].iloc[0] == 5000
    assert approx["exact"].all()   # capacity >> vocab → err 0 → guaranteed
    # truncating capacity below the filler vocab forces err > 0: bounds
    # must stay truthful (lower <= true) and "common" must still win
    tight = top_tokens_approx(str(tmp_path), k=1, capacity=16).to_pandas()
    assert tight["token"].iloc[0] == "common"
    assert tight["cnt"].iloc[0] <= 5000


def test_heavy_hitter_exact_flag_intra_topk():
    """Regression: the exact-rank flag must also defend against the OTHER
    top-k entries' upper bounds.  Planted two-block merge where the
    reported top-1 (A:100) is truly rank 2 (B's true count is 104): neither
    entry may be flagged.  A well-separated summary still flags."""
    from rensa_ray.kernels.freq import HeavyHitterSummary

    b1 = HeavyHitterSummary.from_exact_counts(
        2, np.array(["A", "C", "B"], object), np.array([100, 6, 5]))
    assert b1.err == 5                      # B:5 dropped
    b2 = HeavyHitterSummary.from_exact_counts(
        2, np.array(["B", "D"], object), np.array([99, 7]))
    m = b1.merge(b2)
    toks, cnts, exact = m.topk(2)
    assert list(toks) == ["A", "B"] and list(cnts) == [100, 99]
    assert not exact.any()                  # true order is B(104) > A(100)

    sep = HeavyHitterSummary(3, np.array(["a", "b", "c"], object),
                             np.array([1000, 500, 10]), err=5)
    _, _, ex = sep.topk(2)
    assert ex.all()                         # gaps exceed err on both sides


def test_log_bucket_sketch_signed():
    """Negative values are first-class: sign exact, magnitude within the
    guaranteed relative error, merge still bucket-exact — and the events
    quantile lane survives a corpus with refund-style negative values."""
    import ray.data as rd

    from rensa_ray.kernels.freq import LogBucketSketch
    from rensa_ray.pipelines.textops import events_value_quantiles_approx

    rng = np.random.default_rng(11)
    v = np.concatenate([rng.exponential(10.0, 3000),
                        -rng.exponential(25.0, 2000)])
    s = LogBucketSketch().add(v)
    for q in (0.05, 0.25, 0.5, 0.9, 0.99):
        got, exp = s.quantile(q), float(np.quantile(v, q))
        assert np.sign(got) == np.sign(exp)
        assert abs(got - exp) <= 0.011 * abs(exp) + 1e-9, (q, got, exp)
    halves = LogBucketSketch().add(v[:2500]).merge(
        LogBucketSketch().add(v[2500:]))
    assert (s.counts == halves.counts).all()

    import tempfile

    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"value": pa.array([-3.5, 2.0, 8.0, -1.0, 4.0])}),
            f"{d}/events.parquet")
        row = events_value_quantiles_approx(d).to_pandas().iloc[0]
        assert abs(row["p50"] - 2.0) <= 0.021


def test_events_sliding_window_vs_sql(ray_session, tmp_path):
    """Window counts on a planted events table with same-timestamp peers,
    window-boundary gaps, and multiple users — exact match with DuckDB's
    RANGE frame (the oracle), including peer-inclusive tie semantics."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import events_sliding_window

    m = 60 * 1_000_000
    base = 1_700_000_000_000_000
    rows = [  # (event_id, user_id, minutes-offset)
        (0, 1, 0), (1, 1, 30), (2, 1, 30), (3, 1, 90), (4, 1, 91),
        (5, 2, 0), (6, 2, 61), (7, 3, 5),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([base + r[2] * m for r in rows],
                       pa.timestamp("us")),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = (events_sliding_window(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = (con.execute(entry.oracle_sql()["events_sliding_window"])
            .fetch_arrow_table().to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    assert got.equals(want)
    # hand-checked: 30-min peers count each other; minute-90 still sees the
    # minute-30 peers (trailing edge INCLUSIVE at exactly 60 min) while
    # minute-91 no longer does
    assert got["n_window"].tolist() == [1, 3, 3, 3, 2, 1, 1, 1]


def test_train_val_test_split_stable_and_oracle(ray_session, tmp_path):
    """Split assignment matches the md5-byte oracle, is stable under corpus
    growth (adding docs never reassigns), and lands near 80/10/10."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entry
    from rensa_ray.pipelines.textops import train_val_test_split

    def _write(n):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string())}),
            str(tmp_path / "documents.parquet"))

    _write(400)
    small = (train_val_test_split(str(tmp_path)).to_pandas()
             .set_index("doc_id")["split"])
    _write(2000)
    big = (train_val_test_split(str(tmp_path)).to_pandas()
           .set_index("doc_id")["split"])
    assert (big.loc[small.index] == small).all()   # growth never reassigns
    frac = big.value_counts(normalize=True)
    assert abs(frac["train"] - 204 / 256) < 0.04
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.execute(entry.oracle_sql()["train_val_test_split"])
            .fetch_arrow_table().to_pandas()
            .set_index("doc_id")["split"])
    assert (big.sort_index() == want.sort_index()).all()


def test_strip_boilerplate_lines_planted(ray_session, tmp_path):
    """Per-source stripping: a cookie-banner line shared by 3 docs of srcA
    goes; the same line in srcB (only 2 docs) stays; a doc reduced to zero
    lines disappears; repeating the line twice inside ONE doc does not
    count as two docs."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import strip_boilerplate_lines

    banner = "accept all cookies"
    docs = [
        (0, "A", f"{banner}\nalpha body"),
        (1, "A", f"{banner}\n{banner}\nbeta body"),   # twice in one doc
        (2, "A", banner),                             # vanishes entirely
        (3, "B", f"{banner}\ngamma body"),
        (4, "B", f"{banner}\ndelta body"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "source": pa.array([d[1] for d in docs], pa.string()),
        "text": pa.array([d[2] for d in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = (strip_boilerplate_lines(str(tmp_path), min_docs=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 3, 4]
    assert got["text"].tolist() == [
        "alpha body", "beta body",
        f"{banner}\ngamma body", f"{banner}\ndelta body"]


def test_source_token_kl_planted(ray_session, tmp_path):
    """KL is 0 for a source that mirrors the corpus mix and positive for a
    skewed one; values match a direct numpy computation."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import source_token_kl

    docs = [
        (0, "even", "a b"), (1, "even", "a b"),
        (2, "skew", "a a a b"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "source": pa.array([d[1] for d in docs], pa.string()),
        "text": pa.array([d[2] for d in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = (source_token_kl(str(tmp_path)).to_pandas()
           .set_index("source"))
    # corpus: a=5, b=3, N=8.  even: a=2,b=2,n=4; skew: a=3,b=1,n=4
    def kl(cs, n_s, corpus, n):
        return sum(c / n_s * np.log((c / n_s) / (corpus[t] / n))
                   for t, c in cs.items())
    corpus = {"a": 5, "b": 3}
    assert got.loc["even", "n_tokens"] == 4
    assert abs(got.loc["even", "kl"]
               - round(kl({"a": 2, "b": 2}, 4, corpus, 8), 6)) < 1e-9
    assert abs(got.loc["skew", "kl"]
               - round(kl({"a": 3, "b": 1}, 4, corpus, 8), 6)) < 1e-9
    assert got.loc["skew", "kl"] > got.loc["even", "kl"] > 0


def test_doc_unigram_logprob_planted(ray_session, tmp_path):
    """mean_logprob == (1/n) * sum ln(c(tok)/T) computed directly; common
    vocabulary scores strictly higher than rare-token spam."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import doc_unigram_logprob

    docs = [(0, "a a b"), (1, "a b"), (2, "zzz qqq")]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = (doc_unigram_logprob(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    # corpus counts: a=3, b=2, zzz=1, qqq=1, T=7
    c, T = {"a": 3, "b": 2, "zzz": 1, "qqq": 1}, 7

    def mean_lp(toks):
        return round(float(np.mean([np.log(c[t] / T) for t in toks])), 6)

    assert got["n_tokens"].tolist() == [3, 2, 2]
    assert abs(got.loc[0, "mean_logprob"] - mean_lp(["a", "a", "b"])) < 1e-9
    assert abs(got.loc[1, "mean_logprob"] - mean_lp(["a", "b"])) < 1e-9
    assert abs(got.loc[2, "mean_logprob"] - mean_lp(["zzz", "qqq"])) < 1e-9
    assert got.loc[1, "mean_logprob"] > got.loc[2, "mean_logprob"]


def test_dup_cluster_size_histogram_planted(ray_session, tmp_path):
    """Planted group sizes {3, 2, 1, 1} -> histogram rows (1,2,2), (2,1,2),
    (3,1,3); n_docs sums back to the corpus size."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import dup_cluster_size_histogram

    texts = ["x"] * 3 + ["y"] * 2 + ["u", "v"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = (dup_cluster_size_histogram(str(tmp_path)).to_pandas()
           .sort_values("group_size").reset_index(drop=True))
    assert got.values.tolist() == [[1, 2, 2], [2, 1, 2], [3, 1, 3]]
    assert int(got["n_docs"].sum()) == len(texts)


def test_weighted_sample_by_quality_matches_numpy(ray_session, tmp_path):
    """The A-Res selection equals a single-process numpy evaluation of the
    same md5-derived priorities — deterministic, partitioning-free — and
    longer docs win more often than short ones."""
    import hashlib

    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import weighted_sample_by_quality

    rng = np.random.default_rng(11)
    n, k = 300, 40
    lens = np.where(np.arange(n) % 2 == 0, 2000, 5)
    texts = ["".join(rng.choice(list("abcdef "), m)) for m in lens]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        str(tmp_path / "documents.parquet"))

    got = (weighted_sample_by_quality(str(tmp_path), k=k).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    u = np.array([(int(hashlib.md5(t.encode()).hexdigest()[:15], 16) + 1)
                  / float(1 << 60) for t in texts])
    pri = u ** (1.0 / np.maximum([len(t) for t in texts], 1))
    want = np.argsort(-pri, kind="stable")[:k]
    assert sorted(got["doc_id"].tolist()) == sorted(want.tolist())
    assert got["n_chars"].tolist() == [int(len(texts[i]))
                                       for i in sorted(want.tolist())]
    # weight actually matters: long docs should dominate the sample
    assert (got["n_chars"] > 100).mean() > 0.8


def test_source_shingle_jaccard_planted(ray_session, tmp_path):
    """Hand-computed source-pair shingle Jaccard; zero-overlap pairs are
    omitted and within-source duplicate shingles count once."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import source_shingle_jaccard

    docs = [
        ("A", "a b c d"),       # A shingles: {abc, bcd}
        ("A", "a b c"),         # duplicate shingle abc — counted once
        ("B", "a b c x"),       # B: {abc, bcx}
        ("C", "p q r"),         # C: {pqr} — no overlap with anyone
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "source": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = source_shingle_jaccard(str(tmp_path)).to_pandas()
    assert got.values.tolist() == [["A", "B", round(1 / 3, 6)]]


def test_source_report_planted(ray_session, tmp_path):
    """Hand-computed per-source doc counts, unique texts, dup fraction and
    mean length; NULL-source docs are excluded."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import source_report

    docs = [
        ("A", "xx"), ("A", "xx"), ("A", "yyyy"),   # 3 docs, 2 unique
        ("B", "zzz"),                              # 1 doc, 1 unique
        (None, "orphan"),                          # excluded
    ]
    texts = [d[1] for d in docs]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "source": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        str(tmp_path / "documents.parquet"))

    got = (source_report(str(tmp_path)).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert got.values.tolist() == [
        ["A", 3, 2, round(1 / 3, 6), round(8 / 3, 2)],
        ["B", 1, 1, 0.0, 3.0]]


def test_weighted_sample_tie_keeps_smallest_ids(ray_session, tmp_path):
    """Regression: block-local argpartition kept an ARBITRARY k among
    equal priorities (exact-duplicate texts), dropping the smallest
    doc_ids and making the sample partitioning-dependent.  The global
    rule is (pri desc, doc_id asc)."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import weighted_sample_by_quality

    n, k = 40, 3
    texts = ["same heavy doc " * 50] * n      # all tied at one priority
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        str(tmp_path / "documents.parquet"))
    got = weighted_sample_by_quality(str(tmp_path), k=k).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [0, 1, 2]


def test_doc_ngram_novelty_planted(ray_session, tmp_path):
    """Hand-computed novelty: the first doc owns all its grams, a verbatim
    copy owns none, a half-overlapping doc owns exactly its new half."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import doc_ngram_novelty

    base = "a b c d e"               # trigrams: abc, bcd, cde (3)
    docs = [
        (0, base),                   # all 3 novel
        (1, base),                   # verbatim copy: 0 novel
        (2, "c d e f g"),            # cde (seen), def, efg -> 2/3 novel
        (3, "x y"),                  # <3 words: unigram fallback, 2 novel
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = (doc_ngram_novelty(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_grams"].tolist() == [3, 3, 3, 2]
    assert got["novel_frac"].tolist() == [1.0, 0.0, round(2 / 3, 6), 1.0]


def test_normalized_exact_dedup_kept_planted(ray_session, tmp_path):
    """Case/whitespace variants collapse to one kept doc (min id); docs
    distinct after normalization all survive; NBSP is CONTENT (RE2 \\s is
    ASCII-only — the SQL-oracle semantics), not collapsible whitespace."""
    import __ray_entry__ as entry

    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import normalized_exact_dedup_kept

    texts = [
        "Hello   World",        # 0: canonical form "hello world"
        "hello world",          # 1: same normalized -> dropped
        "  HELLO\nWORLD  ",     # 2: same normalized -> dropped
        "hello worlds",         # 3: distinct
        "",                     # 4: empty normalizes to ""
        "   \n  ",              # 5: whitespace-only -> "" -> dropped vs 4
        "hello\xa0world",      # 6: NBSP is content, NOT merged with 0
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    kept = sorted(normalized_exact_dedup_kept(str(tmp_path))
                  .to_pandas()["doc_id"])
    assert kept == [0, 3, 4, 6]
    # and the SQL oracle agrees on the unicode-whitespace corpus
    assert_matches_sql(normalized_exact_dedup_kept(str(tmp_path)),
                       entry.oracle_sql()["normalized_exact_dedup_kept"],
                       str(tmp_path))


def test_normalized_exact_dedup_kept_oracle(ray_session):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import normalized_exact_dedup_kept

    assert_matches_sql(normalized_exact_dedup_kept(SF_DIR),
                       entry.oracle_sql()["normalized_exact_dedup_kept"])


def test_dup_line_fraction_planted(ray_session, tmp_path):
    """Hand-computed cross-doc duplicate-line fractions: a non-blank line
    counts as duplicated only when >= 2 DISTINCT docs carry it; repeats
    inside one doc do not make it corpus-duplicated, but every position of
    a corpus-duplicated line counts; blank lines (paragraph breaks, empty
    docs) count in neither numerator nor denominator."""
    import __ray_entry__ as entry

    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import dup_line_fraction

    texts = [
        "shared\nunique0",           # 0: "shared" in docs 0,1 -> 1/2
        "shared\nunique1\nshared",   # 1: both "shared" positions dup -> 2/3
        "solo\nsolo",                # 2: repeated only within-doc -> 0/2
        "unique3",                   # 3: 0/1
        "",                          # 4: all-blank doc -> (0, 0, 0.0)
        "para a\n\npara b\n\npara c",  # 5: paragraph breaks are not dup
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = (dup_line_fraction(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    assert got["n_lines"].tolist() == [2, 3, 2, 1, 0, 3]
    assert got["dup_lines"].tolist() == [1, 2, 0, 0, 0, 0]
    assert got["dup_line_frac"].tolist() == [
        0.5, round(2 / 3, 6), 0.0, 0.0, 0.0, 0.0]
    assert_matches_sql(dup_line_fraction(str(tmp_path)),
                       entry.oracle_sql()["dup_line_fraction"],
                       str(tmp_path))


def test_dup_line_fraction_oracle(ray_session):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import dup_line_fraction

    assert_matches_sql(dup_line_fraction(SF_DIR),
                       entry.oracle_sql()["dup_line_fraction"])


def test_doc_format_gates_planted(ray_session, tmp_path):
    """Hand-computed Gopher format signals: bullet/ellipsis line fractions
    over NON-BLANK lines only, word shape over whitespace tokens; empty
    docs report all zeros."""
    import __ray_entry__ as entry

    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import doc_format_gates

    texts = [
        "- item one\n* item two\nprose line",   # 2/3 bullets
        "to be continued...\nthe end",          # 1/2 ellipsis
        "one\n\n   \ntwo…",                     # blanks excluded: 2 lines,
                                                # 1 unicode-ellipsis end
        "ab cde 12",                            # words: mean (2+3+2)/3
        "",                                     # empty -> zeros
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = (doc_format_gates(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_lines"].tolist() == [3, 2, 2, 1, 0]
    assert got["frac_bullet_lines"].tolist() == [
        round(2 / 3, 6), 0.0, 0.0, 0.0, 0.0]
    assert got["frac_ellipsis_lines"].tolist() == [0.0, 0.5, 0.5, 0.0, 0.0]
    assert got["n_words"].tolist() == [8, 5, 2, 3, 0]
    assert got.loc[3, "mean_word_len"] == round(7 / 3, 6)
    # "12" has no alphabetic char
    assert got.loc[3, "frac_alpha_words"] == round(2 / 3, 6)
    assert got.loc[4, "mean_word_len"] == 0.0
    assert_matches_sql(doc_format_gates(str(tmp_path)),
                       entry.oracle_sql()["doc_format_gates"],
                       str(tmp_path))


def test_doc_format_gates_oracle(ray_session):
    import __ray_entry__ as entry

    from rensa_ray.pipelines.textops import doc_format_gates

    assert_matches_sql(doc_format_gates(SF_DIR),
                       entry.oracle_sql()["doc_format_gates"])


def test_r5_dedup_lanes_randomized_vs_sql(ray_session, tmp_path):
    """Randomized differential check of the four r5 lanes against their
    DuckDB oracles on adversarial corpora: prefix containments, case/
    whitespace variants (incl. NBSP and unicode whitespace), shared and
    blank lines, bullets and both ellipsis forms, empty docs.  Also pins
    the cross-lane invariant |normalized kept| <= |exact kept| (collapsing
    a coarser key can only merge more)."""
    import __ray_entry__ as entry

    import pyarrow.parquet as pq

    from rensa_ray.pipelines.simjoin import containment_dedup_kept
    from rensa_ray.pipelines.textops import (
        dup_line_fraction,
        doc_format_gates,
        exact_dedup_kept,
        normalized_exact_dedup_kept,
    )

    oracle = entry.oracle_sql()
    vocab = ["alpha", "beta", "Gamma", "δelta", "x1", "-", "*", "..."]
    for seed in (7, 19):
        rng = np.random.default_rng(seed)
        texts = []
        for i in range(36):
            words = [vocab[j] for j in rng.integers(0, len(vocab), 12)]
            lines = []
            for s in range(0, 12, 4):
                lines.append(" ".join(words[s:s + 4]))
            if rng.random() < 0.3:
                lines.insert(1, "")                     # blank line
            if rng.random() < 0.3:
                lines.append("shared footer line")      # cross-doc dup line
            if rng.random() < 0.2:
                lines.append("to be continued…")
            texts.append("\n".join(lines))
        base = len(texts)
        for i in range(6):                              # containment chains
            texts.append(texts[i] + "\n" + texts[i + 1])
        texts.append(texts[0].upper())                  # case variant
        texts.append(texts[1].replace(" ", "   "))      # ws-reflow variant
        # ASCII tab reflow: whitespace on BOTH the engine (unicode
        # split_whitespace, reference parity) and oracle (RE2 '\s') sides.
        # NBSP is deliberately NOT planted here: the shingle/token lanes
        # follow the reference's unicode split semantics, the SQL oracles
        # RE2's ASCII '\s' — they agree on the ASCII-whitespace testdata
        # domain (the documented convention; see textops module docstring).
        # NBSP-as-content is pinned for the byte-exact normalization lane
        # in test_normalized_exact_dedup_kept_planted.
        texts.append(texts[2].replace(" ", "\t"))
        texts.append("")
        d = str(tmp_path / f"seed{seed}")
        import os

        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string())}),
            os.path.join(d, "documents.parquet"))

        assert_matches_sql(normalized_exact_dedup_kept(d),
                           oracle["normalized_exact_dedup_kept"], d)
        assert_matches_sql(containment_dedup_kept(d, threshold=0.6),
                           oracle["containment_dedup_kept"], d)
        assert_matches_sql(dup_line_fraction(d),
                           oracle["dup_line_fraction"], d)
        assert_matches_sql(doc_format_gates(d),
                           oracle["doc_format_gates"], d)
        n_norm = len(normalized_exact_dedup_kept(d).to_pandas())
        n_exact = len(exact_dedup_kept(d).to_pandas())
        assert n_norm <= n_exact
        assert base < len(texts)  # corpus really carries the planted cases
