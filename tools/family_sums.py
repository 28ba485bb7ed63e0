#!/usr/bin/env python3
"""Add the per-family sf0.1/sf1 sums + ratios to bench_sf1.json.

VERDICT r16 #5: bench_sf1.json's own caveat tells readers to read FAMILY
SUMS (sub-second entries' 10x ratios are dominated by fixed JVM/job-
submission overhead), but the artifact carried only per-query ratios —
this computes the sums it recommends. Families are name-prefix buckets
(ordered regex rules below; first match wins, remainder = relational) —
coarse by design: the point is to aggregate enough per-family seconds
that fixed overhead stops dominating, not a perfect taxonomy.

Usage: python3 tools/family_sums.py [bench_sf1.json]
Rewrites the file in place with a `family_ratio_10x` block:
  {family: {"n": queries, "sf0.1_secs": S, "sf1_secs": S, "ratio_10x": r}}
"""
import json
import re
import sys

# ordered: first match wins
FAMILY_RULES = [
    ("ann", r"^q_(ann_|ivf_|cosine_|embed_|mmr_|hybrid_)"),
    ("dedup", r"^q_(dedup_|decontaminate|chunk_dedup|dup_spans|span_clean"
              r"|fuzzy_join|cdc_chunk)"),
    ("search", r"^q_(bm25_|phrase_|prox|tfidf_|store_|postings|vocab"
               r"|doc_stats)"),
    ("text", r"^q_(bpe_|char_entropy|cooccur_|fingerprint|keywords|lang_id"
             r"|lm_score|ngram_|pii_|quality|repetition|token_count"
             r"|feature_hash|k_anon)"),
    ("streaming", r"^q_(stream_|cdc_|vstore_|vacuum|version_|time_travel"
                  r"|incr_agg)"),
    ("pipeline", r"^q_(corpus_|prep_|pipeline_|retention_|dsv2_|jsonl_"
                 r"|media_|schema_merge|compact|zorder|seq_pack"
                 r"|token_budget|temperature_mix|mixture_split"
                 r"|group_split)"),
    ("sketch", r"^q_(cms_|kmv_|sketch_|equidepth|histogram|percentile"
               r"|profile|outliers|psi_drift|corr_|linreg|stats_agg"
               r"|winsorize)"),
    ("sampling", r"^q_(hash_sample|reservoir|stratified|weighted_sample"
                 r"|upsample|resample)"),
    ("events", r"^q_(funnel|cohort_|transitions|session_|time_|json_extract"
               r"|pagerank|triangles)"),
]


def family_of(name):
    for fam, pat in FAMILY_RULES:
        if re.match(pat, name):
            return fam
    return "relational"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_sf1.json"
    d = json.load(open(path))
    a, b = d["sf0.1"], d["sf1"]
    common = sorted(set(a) & set(b))
    fams = {}
    for q in common:
        f = fams.setdefault(family_of(q), {"n": 0, "sf0.1_secs": 0.0,
                                           "sf1_secs": 0.0})
        f["n"] += 1
        f["sf0.1_secs"] += a[q]
        f["sf1_secs"] += b[q]
    for f in fams.values():
        f["sf0.1_secs"] = round(f["sf0.1_secs"], 2)
        f["sf1_secs"] = round(f["sf1_secs"], 2)
        f["ratio_10x"] = round(f["sf1_secs"] / f["sf0.1_secs"], 2) \
            if f["sf0.1_secs"] > 0 else None
    d["family_ratio_10x"] = dict(sorted(fams.items()))
    json.dump(d, open(path, "w"), indent=1)
    print(json.dumps(d["family_ratio_10x"], indent=1))


if __name__ == "__main__":
    main()
