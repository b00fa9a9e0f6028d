#!/usr/bin/env python3
"""Local differential harness mimicking the driver's DuckDB-oracle compare:
run each oracle SQL in DuckDB against the sf tables, load the Spark result
parquet, canonicalize (columns sorted by name, rows sorted by all columns,
floats rounded), and compare."""
import sys, os, json, glob, math, multiprocessing, re
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# scale-fixture runs push several all-pairs oracles past RAM: give DuckDB a
# spill directory (out-of-core joins/aggs) and an explicit memory budget so
# an oracle that CAN go out-of-core does, instead of dying at the limit.
# Both overridable: GRAFT_DUCKDB_MEM=..., GRAFT_DUCKDB_TMP=...
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '96GB')}'")
tmp = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/graft_duckspill")
os.makedirs(tmp, exist_ok=True)
con.sql(f"SET temp_directory='{tmp}'")
con.sql("SET max_temp_directory_size='60GB'")
tables = []
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    # fixture tables are single files; Spark-written tables (e.g. the
    # synthesized 10x/100x scale fixtures) are directories of part files
    p = f"{sf_dir}/{t}.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    tables.append((t, pat))
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # The DRIVER's canonicalizer sorts the raw frame and dies on
            # list/array cells (unhashable ndarray). Fail loudly here so an
            # array-typed output column can never pass locally (qt27 r6).
            vals = df[c].dropna()
            if len(vals):
                v = vals.iloc[0]
                if isinstance(v, (list, tuple, dict)) or getattr(v, "ndim", 0) > 0:
                    raise TypeError(
                        f"column '{c}' is array-typed — the driver cannot sort it; "
                        "serialize to a scalar (concat_ws / array_to_string)")
            # normalize missing BEFORE stringifying: a duckdb .df() frame
            # carries NaN in object columns, a parquet round-trip (the
            # subprocess oracle path) carries None — astype(str) would
            # spell them 'nan' vs 'None' and mismatch on every null row
            na = df[c].isna()
            df[c] = df[c].astype(str)
            df.loc[na, c] = "<NULL>"
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    # Row-alignment rule: sort by non-float columns FIRST, floats last. The
    # ulp/rtol rescue below compares columns positionally after this sort;
    # with alphabetical order a float aggregate can precede the key columns,
    # and a 1-ulp engine difference in that float between near-tied rows
    # would align exp/got differently — turning tolerable conversion noise
    # into a confusing multi-column mismatch FAIL instead of a rescue.
    # Floats stay in the key (tail position) so frames that differ only in
    # float columns still sort deterministically; whenever the non-float
    # columns identify rows (the usual case: keys are ids/strings), the
    # alignment is immune to sub-tolerance float noise entirely.
    non_float = [c for c in df.columns
                 if not str(df[c].dtype).startswith("float")]
    floats = [c for c in df.columns if str(df[c].dtype).startswith("float")]
    df = df.sort_values(by=non_float + floats).reset_index(drop=True)
    return df

# Optional per-oracle wall-clock cap for scale-fixture sweeps: several
# oracles are deliberately quadratic (exact all-pairs ground truth) and are
# DuckDB-capacity-bound beyond the base fixture — cap them so the sweep
# reports "oracle capacity" instead of running for hours. Unset (the
# default, and the driver regime) = no cap.
timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

def _strip_sql_comments(s):
    """Remove SQL '--' line comments before the CTE scanner runs — an
    unbalanced paren or quote inside a comment would otherwise miscount
    depth. Quote-aware: a '--' inside a single-quoted literal is content
    (e.g. a regex), not a comment."""
    out, i, n, in_str = [], 0, len(s), False
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    out.append("''"); i += 2; continue
                in_str = False
            out.append(c); i += 1
        elif c == "'":
            in_str = True; out.append(c); i += 1
        elif c == "-" and i + 1 < n and s[i + 1] == "-":
            while i < n and s[i] != "\n":
                i += 1
        else:
            out.append(c); i += 1
    return "".join(out)

def split_cte_script(sql):
    """Mechanically stage a `WITH [RECURSIVE] a AS (..), b AS (..) SELECT ..`
    oracle into per-CTE statements: [(name, body, is_recursive), ...] plus
    the final SELECT. Quote-aware, paren-depth-aware — CTE bodies contain
    regex strings with parens/commas. '--' comments are stripped up front
    (see _strip_sql_comments). KNOWN LIMITATION: double-quoted identifiers
    are NOT understood — a quoted identifier containing a paren, quote, or
    'AS' would misparse (no current oracle uses them; keep it that way or
    teach the scanner). The is_recursive name-mention check can also
    false-positive on a column alias that shadows the CTE name — harmless
    (the CTE still materializes, just via the WITH RECURSIVE wrapper).
    Used by the staged-oracle path below; returns (None, sql) when the
    statement has no top-level WITH."""
    s = _strip_sql_comments(sql).strip()
    m = re.match(r"(?is)^WITH\s+(RECURSIVE\s+)?", s)
    if not m:
        return None, sql
    i = m.end()
    ctes = []
    n = len(s)
    while True:
        # optional CTE column list: `reachc(id, l) AS (...)` — the list is
        # carried through so staging can rename (plain comma-separated
        # identifiers only; an expression-bearing list won't match and the
        # whole script falls back to one-statement)
        mm = re.compile(r'\s*([A-Za-z_][A-Za-z0-9_]*)\s*'
                        r'(\(\s*[A-Za-z_][A-Za-z0-9_]*'
                        r'(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*\s*\))?'
                        r'\s+AS\s+(MATERIALIZED\s+)?\(',
                        re.IGNORECASE).match(s, i)
        if not mm:
            return None, sql  # unparseable — fall back to one-statement
        name = mm.group(1)
        collist = mm.group(2) or ""
        j = mm.end()  # just past the opening paren
        depth, in_str = 1, False
        while j < n and depth > 0:
            c = s[j]
            if in_str:
                if c == "'":
                    if j + 1 < n and s[j + 1] == "'": j += 1  # '' escape
                    else: in_str = False
            elif c == "'": in_str = True
            elif c == "(": depth += 1
            elif c == ")": depth -= 1
            j += 1
        body = s[mm.end():j - 1]
        recursive = re.search(r"\b%s\b" % re.escape(name), body) is not None
        ctes.append((name, collist, body, recursive))
        k = j
        while k < n and s[k].isspace(): k += 1
        if k < n and s[k] == ",":
            i = k + 1
        else:
            return ctes, s[k:]

# Entries whose one-statement oracle outgrows DuckDB at the scale decades
# but whose CTE chain runs fine when each stage MATERIALIZES into a temp
# table (memory released between stages, no single giant plan). Staged
# execution is used only in the timeout (scale-sweep) regime — the driver
# path executes the identical single statement it always did.
STAGED_AT_SCALE = {"qc02_curation_delta", "q50_pagerank",
                   "q50p_pagerank_prod", "q53_trustrank",
                   "q53p_trustrank_prod",
                   # r14: the text-oracle family — the one-statement forms
                   # OOM DuckDB at 100x holding the whole bigram/char
                   # pipeline at once, but each CTE materialized as a temp
                   # table (bg ~400M slim rows, contrib likewise) fits the
                   # budget with memory released between stages
                   "qt40_lm_score", "qt46_lm_buckets",
                   "qt46a_lm_buckets_approx", "qt51_entropy",
                   # r15: the production-rule LSH pair oracle — the dots
                   # grid (N·tables·planes rows), bucket memberships, and
                   # the ~tens-of-millions-pair candidate set each
                   # materialize once instead of DuckDB holding the whole
                   # chain's hash joins live at the 100x fixture
                   "qt12p_embed_neardup_prod"}

def _oracle_child(sql, path, staged=False):
    """Runs one oracle in a forked child: a capacity-class oracle can OOM,
    or even segfault libduckdb after repeated near-limit allocations
    (observed) — process isolation is the only boundary that contains
    both AND returns the memory in full between oracles."""
    try:
        c2 = duckdb.connect()
        c2.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '96GB')}'")
        c2.sql(f"SET temp_directory='{tmp}'")
        c2.sql("SET max_temp_directory_size='60GB'")
        for t_ in tables:
            c2.sql(f"CREATE VIEW {t_[0]} AS SELECT * FROM '{t_[1]}'")
        if staged:
            ctes, final = split_cte_script(sql)
            if ctes is not None:
                for name, collist, body, recursive in ctes:
                    if recursive:
                        c2.sql(f"CREATE TEMP TABLE {name} AS "
                               f"WITH RECURSIVE {name}{collist} AS ({body}) "
                               f"SELECT * FROM {name}")
                    elif collist:
                        # rename via a derived-table alias: DuckDB's CTAS
                        # has no column-list form
                        c2.sql(f"CREATE TEMP TABLE {name} AS "
                               f"SELECT * FROM ({body}) AS _g{collist}")
                    else:
                        c2.sql(f"CREATE TEMP TABLE {name} AS {body}")
                sql = final
        c2.sql(sql).df().to_parquet(path)
    except duckdb.OutOfMemoryException as e:
        with open(path + ".cap", "w") as f: f.write(str(e))
    except Exception as e:
        with open(path + ".err", "w") as f: f.write(f"{type(e).__name__}: {e}")

def run_oracle(sql, name=None, timeout=None):
    """Returns (df, capacity_reason). capacity_reason None = df is valid;
    raises on a genuine (non-capacity) oracle error."""
    if timeout is None:
        timeout = timeout_s
    if timeout <= 0:
        return con.sql(sql).df(), None
    path = os.path.join(tmp, "oracle_result.parquet")
    for p_ in (path, path + ".cap", path + ".err"):
        if os.path.exists(p_): os.remove(p_)
    # a killed/OOMed child leaks its spill blocks (no process left to
    # clean them); 9 such children at the 60GB cap would fill the disk —
    # sweep the temp dir before each oracle (serial execution, nothing
    # else owns these files)
    for f_ in glob.glob(os.path.join(tmp, "duckdb_temp_*")):
        try: os.remove(f_)
        except OSError: pass
    proc = multiprocessing.Process(target=_oracle_child,
                                   args=(sql, path, name in STAGED_AT_SCALE))
    proc.start(); proc.join(timeout)
    if proc.is_alive():
        proc.kill(); proc.join()
        return None, f"timeout {timeout:.0f}s"
    if os.path.exists(path + ".err"):
        raise RuntimeError(open(path + ".err").read())
    if os.path.exists(path + ".cap"):
        return None, "OOM: " + open(path + ".cap").read().splitlines()[0]
    if proc.exitcode != 0:
        return None, f"engine crash (exit {proc.exitcode})"
    df = pd.read_parquet(path); os.remove(path)
    return df, None

# Capacity-class oracles KNOWN to outgrow DuckDB on the synthesized scale
# fixtures BY DESIGN — the SQL twin exists for bit-parity at base scale and
# is deliberately more expensive than the operator it checks. A skip here
# is expected behavior, not a missing check; each entry names the scaled
# stand-in that stays green at every decade.
CAPACITY_BY_DESIGN = {
    "q50_pagerank": "unrolled power-iteration CTEs over the full trade "
        "graph; STAGED_AT_SCALE rescues 10x (hash-green, r12) — at 100x "
        "the staged standalone form is MEMORY-bound: the r16 automatic "
        "retry (1500s/70GB, BIGINT node ids) still OOMs, re-confirming "
        "the r13 VARCHAR-era measurement post-BIGINT. "
        "q50s_pagerank_panel (the residue-class subgraph twin, r14) is "
        "the value check at decades where even the staged form exceeds "
        "the cap",
    "q50p_pagerank_prod": "same unrolled-CTE oracle premium as q50_pagerank "
        "(staged form green at 10x, r12). At 100x the staged form is "
        "MEMORY-bound, not time-bound: standalone retries OOM at "
        "1500s/85GB with VARCHAR node ids (r13) AND at 1500s/70GB with "
        "BIGINT ids (r16 auto-retry) — the 160M-edge contribution frames "
        "x 3 unrolled iterations exceed the budget regardless of key "
        "width; Spark side green at 100x. q50s_pagerank_panel (r14) is "
        "the tractable-at-any-decade value check for the family",
    "q53_trustrank": "same unrolled-CTE oracle premium as q50_pagerank "
        "(personalized variant; staged form green at 10x, r12; 100x "
        "staged standalone retry OOMs post-BIGINT, r16); "
        "q53s_trustrank_panel (r14) is the any-decade value check",
    "q53p_trustrank_prod": "same unrolled-CTE oracle premium as "
        "q50_pagerank (staged form green at 10x, r12; 100x staged "
        "standalone retry OOMs post-BIGINT, r16); "
        "q53s_trustrank_panel (r14) is the any-decade value check",
    "q31_scalar_dates": "one-statement re-derivation of the full "
        "scalar-dates frame — green at <=100x (60M rows, 2048s at the "
        "100x fixture, PARITY_r15_100x) but the one-statement form "
        "outgrows any reasonable sweep cap at larger decades while the "
        "Spark side dumps green; the 100x green record plus "
        "q02_project_filter (always-cheap, green at every decade) carry "
        "the family's value check beyond 100x",
    "q32_silver_od": "one-statement re-derivation of the full silver OD "
        "transform — green at <=100x (49.6M rows, 1612s at the 100x "
        "fixture, PARITY_r15_100x) but beyond that the oracle outgrows "
        "the sweep cap while the Spark side dumps green; the 100x green "
        "record is the transform's value check at larger decades",
    "qt12_embed_neardup": "the exact all-pairs near-dup baseline (the "
        "oracle target and qt12r's ground truth) is O(n²) by definition — "
        "2·10^10 pair dot products at the 100× fixture (hits the Spark "
        "wall cap; value-checked at 1× and 10×). The scale path is "
        "qt12p_embed_neardup_prod — the log-N planes rule's LSH "
        "candidates + exact verify, value-checked at every decade (r15)",
    "qt12r_embed_neardup_recall": "exact all-pairs recall baseline is "
        "O(n²) by definition; the residue-class panel inside the entry is "
        "the scaled check. At 100× even the SPARK side is capacity-bound "
        "(measured r13): the entry's FIXED LSH operating points "
        "(planes=8 → 256 buckets) put ~780 of the 200k near-random "
        "vectors in every bucket, so the candidate generator feeds "
        "~10^10 raw id pairs into its dedup shuffle (~700 GB — filled "
        "the disk at 559 s). Production scales planes with log N "
        "(Dedup.lshPlanesForCorpus) — qt12p_embed_neardup_prod runs that "
        "rule's full pair set and qt12rs_embed_neardup_recall_panel its "
        "recall grid at every decade (r15); the fixed-point recall grid "
        "here is fixture-scale instrumentation, pre-declared via "
        "SPARK_GRAFT_CAPACITY_SKIP at 100×",
    "qt46_lm_buckets": "re-derives the corpus bigram-NLL model in one "
        "query; STAGED_AT_SCALE runs it green at 100x (r14; re-confirmed "
        "r16 in-sweep under a 120s cap on a quiet machine — the r15 "
        "in-sweep OOMs were environmental), and "
        "qt46s_lm_buckets_sampled is the always-cheap slice twin",
    "qc02_curation_delta": "re-derives the ENTIRE batch curation run (the "
        "corpus state) plus the delta chain; the one-statement form is "
        "capacity-bound past 10x, so the scale sweep STAGES it "
        "(STAGED_AT_SCALE: each CTE materializes as a temp table) — this "
        "registry entry is the fallback story if even the staged form "
        "exceeds the cap at a given decade",
    "qt46a_lm_buckets_approx": "re-derives the corpus bigram-NLL model in "
        "one query (~105 GB one-statement at the 100x fixture); "
        "STAGED_AT_SCALE runs it green at 100x (500k rows — r14, "
        "re-confirmed r16 via the automatic standalone retry), and "
        "qt46s_lm_buckets_sampled runs the identical chain on the "
        "doc_id % 31 slice at every decade",
    "qt40_lm_score": "one-statement corpus bigram-NLL re-derivation OOMs "
        "DuckDB at the 100x fixture; STAGED_AT_SCALE rescues it — green "
        "at 100x (500k rows; r14 at a 900s cap, re-confirmed r16 "
        "in-sweep under a 120s cap) — so this registry entry is the "
        "fallback story for a decade where even the staged form exceeds "
        "the cap; qt40s_lm_score_sampled is the always-cheap slice twin",
    "qt26r_semdedup_recall": "the recall GRID re-derives Lloyd-trained "
        "semdedup pair sets per nlist plus the sampled exact baseline in "
        "SQL — capacity-bound at the 100x fixture (timeout at 400s and at "
        "a standalone 900s/80GB retry, r13). The OPERATOR'S full survivor "
        "decision is qt26_semdedup, hash-green at 100x (200k rows), and "
        "qt26rs_semdedup_recall_panel (r14, both-endpoints-in-panel pair "
        "sets) is the recall value check at every decade",
    "qt51_entropy": "the oracle re-derives per-doc character entropy by "
        "exploding text to characters (~1e9 rows at the 100x fixture; "
        "DuckDB OOM one-statement, r13; STAGED_AT_SCALE retries fail at "
        "900s/70GB (timeout, r14) and 1500s/70GB (OOM, r16 auto-retry) — "
        "compute- and memory-bound, not plan-shape-bound) — the premium "
        "is the oracle's, not the operator's: the Spark side is a "
        "map-side native expression, dumped green at 100x, and "
        "qt51s_entropy_sampled (r14, the doc_id % 31 slice) is the "
        "value check at every decade",
}

def skip_reason(name, cap):
    by_design = CAPACITY_BY_DESIGN.get(name)
    return (f"oracle capacity ({cap}) — BY DESIGN: {by_design}" if by_design
            else f"oracle capacity ({cap})")

# GRAFT_ONLY=qa,qb limits the compare to named entries (mirrors Verify's
# SPARK_GRAFT_ONLY) — without it a 4-entry scale spot-check still runs
# EVERY oracle at the scale fixture, because the oracle executes before
# the spark-output existence check.
only = {s.strip() for s in os.environ.get("GRAFT_ONLY", "").split(",") if s.strip()}

# GRAFT_ORACLE_SKIP=qa,qb pre-declares ORACLE capacity at this fixture:
# the entry's skip is recorded (BY-DESIGN rationale attached) without
# burning the wall cap on an oracle already adjudicated capacity-bound at
# a smaller decade — the oracle-side twin of SPARK_GRAFT_CAPACITY_SKIP.
# Entries named here must be in CAPACITY_BY_DESIGN (fail loudly: a
# pre-declaration without a registered rationale is a silent coverage
# hole, not a documented one). Retries don't fire on pre-declared skips.
oracle_skip = {s.strip() for s in os.environ.get("GRAFT_ORACLE_SKIP", "").split(",")
               if s.strip()}
_unreg = oracle_skip - set(CAPACITY_BY_DESIGN)
if _unreg:
    raise SystemExit(f"GRAFT_ORACLE_SKIP entries not in CAPACITY_BY_DESIGN: "
                     f"{','.join(sorted(_unreg))}")

fails = 0
capacity = []   # oracle-side OOM/timeout: the ORACLE can't run, not a diff
# per-entry record for the machine-readable parity artifact
# (GRAFT_PARITY_JSON=path): status ok|fail|skip, rows, reason
record = {}
import time

def compare_entry(name, exp, t0):
    """Diff a successfully-run oracle frame against the Spark dump.
    Returns the entry's record dict (status ok|fail) and prints the
    OK/FAIL line — the caller owns the fail counter and the record map."""
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        return {"status": "fail", "reason": "spark output missing"}
    try:
        exp, got = canon(exp), canon(got)
    except TypeError as e:
        print(f"FAIL {name}: {e}")
        return {"status": "fail", "reason": str(e)}
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}")
        return {"status": "fail", "reason": "column mismatch"}
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
        return {"status": "fail",
                "reason": f"rows {len(got)} vs oracle {len(exp)}"}
    if not exp.equals(got):
        neq = (exp != got) & ~(exp.isna() & got.isna())
        # Float columns: DECIMAL→DOUBLE conversion can differ by 1 ulp
        # between engines (Spark's BigDecimal.doubleValue is correctly
        # rounded; DuckDB's int128→double then /10^scale may double-round).
        # At ~4e11 magnitudes 1 ulp ≈ 6e-5, beyond round(6)'s reach. rtol
        # 2e-15 ≈ 4.5 ulps absorbs conversion noise while a CENT error at
        # 4e11 (rel 2.5e-14) still fails — the tolerance window sits a
        # decade below the smallest real money bug at these magnitudes.
        import numpy as np
        ulp_rescued = []
        for c in exp.columns:
            if (str(exp[c].dtype).startswith("float")
                    and str(got[c].dtype).startswith("float")
                    and neq[c].any()):
                close = np.isclose(exp[c].to_numpy(), got[c].to_numpy(),
                                   rtol=2e-15, atol=1e-9, equal_nan=True)
                if (neq[c] & close).any():
                    ulp_rescued.append(c)
                neq[c] = neq[c] & ~close
        bad = neq.any(axis=1)
        if not bad.any():
            # never silent: a tolerance-rescued pass is visible in the log
            print(f"OK   {name}: {len(exp)} rows "
                  f"(ulp-tolerance on {','.join(ulp_rescued)})", flush=True)
            return {"status": "ok", "rows": int(len(exp)),
                    "ulp_tolerance_cols": ulp_rescued,
                    "oracle_sec": round(time.time() - t0, 1)}
        print(f"FAIL {name}: {bad.sum()} mismatched rows of {len(exp)}")
        print("  oracle:", exp[bad].head(3).to_dict("records"))
        print("  spark: ", got[bad].head(3).to_dict("records"))
        return {"status": "fail",
                "reason": f"{int(bad.sum())} mismatched rows of {len(exp)}"}
    print(f"OK   {name}: {len(exp)} rows", flush=True)
    return {"status": "ok", "rows": int(len(exp)),
            "oracle_sec": round(time.time() - t0, 1)}

for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    t0 = time.time()
    # Spark-side capacity marker (Verify's SPARK_GRAFT_ENTRY_TIMEOUT wall
    # cap, scale-sweep regime only): the SPARK side couldn't complete at
    # this fixture — classify before burning oracle time on it
    if os.path.exists(f"{out_dir}/{name}/_CAPACITY"):
        why = open(f"{out_dir}/{name}/_CAPACITY").read().strip()
        reason = f"spark capacity ({why})"
        bd = CAPACITY_BY_DESIGN.get(name)
        if bd:
            reason += f" — BY DESIGN: {bd}"
        print(f"SKIP {name}: {reason}", flush=True)
        record[name] = {"status": "skip", "reason": reason}
        capacity.append(name); continue
    if name in oracle_skip:
        reason = skip_reason(name, "pre-declared at this fixture; "
                                   "adjudicated at a smaller decade")
        print(f"SKIP {name}: {reason}", flush=True)
        record[name] = {"status": "skip", "reason": reason,
                        "pre_declared": True}
        capacity.append(name); continue
    try:
        exp, cap = run_oracle(sql, name)
        if cap:
            reason = skip_reason(name, cap)
            print(f"SKIP {name}: {reason}", flush=True)
            record[name] = {"status": "skip", "reason": reason}
            capacity.append(name); continue
    except duckdb.OutOfMemoryException as e:
        reason = skip_reason(name, f'OOM: {e}')
        print(f"SKIP {name}: {reason}")
        record[name] = {"status": "skip", "reason": reason}
        capacity.append(name); continue
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1
        record[name] = {"status": "fail", "reason": f"oracle error: {e}"}; continue
    rec = compare_entry(name, exp, t0)
    if rec["status"] == "fail":
        fails += 1
    record[name] = rec

# STAGED_AT_SCALE auto-retry (the r14 manual-addendum pattern, automated —
# r15's 100x sweep silently dropped it and the record lost its
# self-containedness): every STAGED_AT_SCALE member whose ORACLE skipped
# (capacity under the in-sweep cap) is re-run standalone, serially, with a
# longer wall cap — memory fully released between entries, nothing else
# contending — and the outcome is folded into the SAME parity record as
# `retry` evidence. Spark-capacity skips are exempt (no dump to compare
# against). GRAFT_STAGED_RETRY_TIMEOUT=0 disables.
retry_timeout = float(os.environ.get("GRAFT_STAGED_RETRY_TIMEOUT", "1500") or 0)
if timeout_s > 0 and retry_timeout > 0:
    retry_names = [n for n in sorted(STAGED_AT_SCALE)
                   if record.get(n, {}).get("status") == "skip"
                   and not record[n].get("pre_declared")
                   and not os.path.exists(f"{out_dir}/{n}/_CAPACITY")]
    for name in retry_names:
        in_sweep = record[name]["reason"].split(" — ")[0]
        print(f"RETRY {name}: STAGED_AT_SCALE standalone rerun "
              f"(timeout {retry_timeout:.0f}s; in-sweep: {in_sweep})", flush=True)
        t0 = time.time()
        try:
            exp, cap = run_oracle(oracle[name], name, timeout=retry_timeout)
        except Exception as e:
            exp, cap = None, f"oracle error on retry: {e}"
        if cap:
            record[name]["retry"] = {
                "staged": True, "timeout_s": retry_timeout, "status": "skip",
                "note": f"staged standalone rerun still capacity-bound ({cap})"}
            print(f"SKIP {name}: staged retry still capacity ({cap})", flush=True)
            continue
        rec = compare_entry(name, exp, t0)
        rec["retry"] = {
            "staged": True, "timeout_s": retry_timeout,
            "note": f"in-sweep form skipped ({in_sweep}); STAGED_AT_SCALE "
                    f"standalone rerun against the same dump artifacts: "
                    f"{rec['status']}, {rec.get('rows', '?')} rows"}
        if rec["status"] == "fail":
            fails += 1
        if name in capacity:
            capacity.remove(name)
        record[name] = rec
# queries without oracle
for p in sorted(glob.glob(f"{out_dir}/*/")):
    n = p.rstrip("/").split("/")[-1]
    if only and n not in only:
        continue
    if n not in oracle:
        # a dir holding only a _CAPACITY/_FAILED marker has no parquet to
        # count — classify instead of letting DuckDB's IO error abort the
        # script before the parity JSON is written
        marker = next((m for m in ("_CAPACITY", "_FAILED")
                       if os.path.exists(p + m)), None)
        if marker:
            why = open(p + marker).read().strip()
            st = "skip" if marker == "_CAPACITY" else "fail"
            print(f"{'SKIP' if st == 'skip' else 'FAIL'} {n}: "
                  f"{marker[1:].lower()} marker, no oracle ({why})")
            record[n] = {"status": st, "reason": f"{marker} ({why}), no oracle"}
            if st == "skip": capacity.append(n)
            else: fails += 1
            continue
        try:
            cnt = con.sql(f"SELECT count(*) FROM '{p}*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {n}: unreadable spark output (no oracle): {e}")
            fails += 1
            record[n] = {"status": "fail",
                         "reason": f"unreadable spark output: {e}"}
            continue
        print(f"ROWS {n}: {cnt} rows (no oracle)")
        record[n] = {"status": "rows_only", "rows": int(cnt)}
parity_path = os.environ.get("GRAFT_PARITY_JSON")
if parity_path:
    ok = sum(1 for r in record.values() if r["status"] == "ok")
    summary = {"sf_dir": sf_dir, "out_dir": out_dir,
               "oracle_timeout_s": timeout_s,
               "duckdb_mem": os.environ.get("GRAFT_DUCKDB_MEM", "96GB"),
               "oracled": len([n for n in oracle if not only or n in only]),
               "value_checked": ok, "failures": fails,
               "capacity_skips": capacity}
    with open(parity_path, "w") as f:
        json.dump({"summary": summary, "entries": record}, f, indent=1)
    print(f"parity record written to {parity_path}")
print(f"\n{fails} failures / {len(oracle)} oracled queries"
      + (f" ({len(capacity)} oracle-capacity skips: {','.join(capacity)})"
         if capacity else ""))
sys.exit(1 if fails else 0)
