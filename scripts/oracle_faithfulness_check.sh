#!/bin/bash
# Validates the dedup-core DuckDB oracles on a synthetic corpus that
# actually contains ALL THREE verified edge types (exact-dup trio,
# suffix-containment pair with Jaccard << tau, near-dup pair) — the driver
# testdata at sf0.01 has neither containment nor identical texts, so green
# rows there alone would not prove the sfx/exact_star CTE branches.
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/synthsf
python3 - <<'EOF'
import duckdb
rows = []
def toks(n, tag): return " ".join(f"{tag}{i}" for i in range(n))
for i in range(10): rows.append((i, toks(80, f"u{i}_"), "en", "srcA"))
t = toks(90, "ex_")
for i in (11,12,13): rows.append((i, t, "en", "srcB"))          # exact trio
a = toks(60, "cont_")
rows.append((20, a, "en", "srcC"))                               # contained
rows.append((21, toks(200,"pre_")+" "+a+" "+toks(200,"post_"), "en", "srcC"))
base = [f"nd{i}" for i in range(200)]
v = list(base); v[5] = "CHANGED"; v[77] = "ALSO"
rows.append((30, " ".join(base), "en", "srcD"))                  # near dup
rows.append((31, " ".join(v), "en", "srcD"))
# MINHASH-ONLY near-dup pair: pair (30,31)'s edits leave >=50-token common
# runs, so it collapses to src='suffix' and the margin probes over the
# minhash/simhash surfaces were VACUOUS on this corpus. One token DELETED
# at index 45 of 95 keeps every common run < suffixMinLen=50 (runs 45/49)
# while exact Jaccard stays ~0.905 >= the 0.875 dup margin — a real
# minhash-source witness for both probe surfaces.
mh = [f"mh{i}" for i in range(95)]
rows.append((40, " ".join(mh), "en", "srcE"))
rows.append((41, " ".join(mh[:45] + mh[46:]), "en", "srcE"))
# NON-ASCII byte/char witness (round-3 VERDICT "what's wrong" #1): 70 'é'
# chars = 140 UTF-8 bytes, so char length (73) < 100 <= byte length (143).
# The engine sizes payloads/filters in BYTES (getBytes(UTF_8) /
# octet_length); DuckDB strlen(VARCHAR) is also BYTES (length() is chars) —
# mm_decode / mm_frames / corpus_filter below prove the twins agree on
# multibyte text, so the oracles carry no ASCII-corpus assumption.
rows.append((50, "é" * 70 + " ok", "en", "srcF"))
con = duckdb.connect()
con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)")
con.executemany("INSERT INTO d VALUES (?,?,?,?)", rows)
con.execute("ALTER TABLE d ADD COLUMN n_chars BIGINT"); con.execute("UPDATE d SET n_chars = length(text)")
con.execute("COPY d TO '/tmp/synthsf/documents.parquet' (FORMAT PARQUET)")
EOF
for t in region nation customer supplier part orders lineitem events embeddings; do
  cp -r /root/testdata/sf0.01/$t.parquet /tmp/synthsf/ 2>/dev/null || true
done
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.Verify /tmp/synthsf /tmp/verify_synth" >/dev/null 2>&1
python3 - <<'EOF'
import duckdb, json, pandas as pd
d='/tmp/synthsf'; con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
sqls = json.load(open('/tmp/verify_synth/oracle_sql.json'))
fails = 0
for name in ['dedup_clusters','cluster_members','dedup_cluster_stats','first_stories',
             'novelty_scores','dedup_jaccard_sql','exact_dup_groups','norm_dup_groups',
             'mm_decode','mm_frames','corpus_filter']:
    exp = con.execute(sqls[name]).fetchdf(); got = pd.read_parquet(f'/tmp/verify_synth/{name}')
    exp, got = (x.reindex(sorted(x.columns), axis=1) for x in (exp, got))
    exp, got = (x.sort_values(list(x.columns)).reset_index(drop=True) for x in (exp, got))
    try:
        pd.testing.assert_frame_equal(exp, got, check_dtype=False, check_exact=True)
        print(name, 'OK', len(exp))
    except Exception as e:
        fails += 1; print(name, 'MISMATCH', str(e)[:300])
raise SystemExit(1 if fails else 0)
EOF

# --- margin probes (CLAUDE.md rule: re-probe whenever testdata changes) ---
# The dedup-core oracles' rjac branch is exact Jaccard >= tau over all rep
# pairs, while the pipeline verifies est-Jaccard/Hamming over LSH
# candidates; value-exact oracle equality rests on no candidate pair
# sitting NEAR tau=0.7. Assert the documented margins on both corpora:
# every LSH candidate pair's exact Jaccard is >= 0.875 (clearly a dup on
# both sides) or <= 0.1 (clearly not) — a pair inside the gap means the
# margins must be re-derived before trusting green oracle rows.
probe_margins() {
  python3 - "$1" <<'EOF'
import sys, pandas as pd
d = sys.argv[1]
# candidate-level surface (pre-verify, sub-tau candidates included):
# dedup_exact_jaccard is now the VERIFIED-only oracled query and cannot
# witness the sub-tau side of the margin
j = pd.read_parquet(f'{d}/dedup_cand_jaccard')
if len(j) == 0:
    # a corpus with no minhash/simhash candidates proves nothing — fail
    # loudly instead of passing vacuously (the synth corpus plants a
    # minhash-only pair precisely so this surface is populated)
    print(f'{d}: VACUOUS margin probe (0 candidate pairs)'); raise SystemExit(1)
jac = j['inter'] / j['uni']
bad = j[(jac > 0.1) & (jac < 0.875)]
print(f'{d}: {len(j)} LSH candidate pairs, margin violations: {len(bad)}')
if len(bad):
    print(bad.head(10)); raise SystemExit(1)
v = pd.read_parquet(f'{d}/dedup_exact_jaccard')
vbad = v[v['inter'] * 1.0 / v['uni'] < 0.875]
print(f'{d}: {len(v)} verified pairs, below-0.875 violations: {len(vbad)}')
if len(vbad):
    print(vbad.head(10)); raise SystemExit(1)
EOF
}
probe_margins /tmp/verify_synth
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_margin" >/dev/null 2>&1
probe_margins /tmp/verify_margin
echo "margin probes OK"
