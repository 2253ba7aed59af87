#!/usr/bin/env python3
"""sf>0.1 parity sweep: Spark vs DuckDB on a synthetic ~sf0.5 tick tape.

The ROUND-half-boundary divergence class (SURVEY §4) was invisible at
sf0.01 and only surfaced at sf0.1 — each scale-up exposes the next
latent engine-divergence class, so this self-check runs the
float-emitting tick family at ~5x sf0.1 without needing driver-side
testdata. It synthesizes an adversarial events.parquet with pyarrow
(TIMESTAMP(MICROS), isAdjustedToUTC=false — same physical schema as
the r9-regenerated real testdata),
then reuses graft.Verify + tools/compare_oracle.py verbatim: both
engines read the SAME file, so no closed-form generator mirror is
needed, and a hash mismatch is a genuine engine divergence.

Adversarial content (seeded, deterministic):
- 2-dp grid prices with dense ±0.01 walks around 100/200/400 — exact
  .5-decimal-boundary return quotients (the 200.01/200.00-1 class);
- ~10% 4-dp prices (non-terminating quotients), ~0.1% exact zeros
  (ANSI divide guards), zero volumes (volumeProfile share guard);
- ~1% exact (symbol, ts) duplicate pairs (tie-key determinism).

Excluded queries: q_ema / q_macd / q_kama / q_heikin_ashi /
q_cusum_events — their recursive-CTE oracles are row-by-row in DuckDB
(~minutes at 50k+ recursion rows); their recursions run on exact
2-dp DECIMAL state (SURVEY §4), not the float-emission class this
sweep targets.

Usage: python3 tools/parity_sweep.py [--rows 500000] [--gen-only]
"""
import argparse
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# float-emitting / quantize-pattern tick family, non-recursive oracles
FAMILY = """
q_ohlc_daily q_vwap_daily q_twap_daily q_sma q_returns q_volatility
q_realized_vol q_rsi q_bollinger q_stochastic q_atr q_donchian q_beta
q_zscore q_drawdown q_obv q_autocorr q_roll_spread q_amihud
q_price_impact q_trend q_seasonality q_slippage q_ofi q_vpin
q_correlation q_leadlag q_pairs_spread q_mad_outliers q_higher_moments
q_overnight_gaps q_volume_profile q_pivot_points q_intraday_vol
q_size_histogram q_dollar_bars q_stale_runs q_ordinal_patterns
q_downsample q_resample_hourly q_histogram q_gap_stats q_volume_bars
q_mfi q_cmf q_cci q_ulcer q_variance_ratio q_ichimoku
q_williams_r q_roc q_dow_returns q_underwater q_streaks
q_drawdown_episodes q_market_index q_abnormal_volume q_volume_curve
q_momentum_quartiles q_turnover_rank
q_aroon q_vortex q_cmo q_keltner q_ad_line q_eom q_force_index
q_tick_size q_price_clustering q_burst_census q_benford
q_session_stats q_activity_gini q_adx q_trix q_elder_ray q_mass_index
q_parabolic_sar q_chandelier q_risk_ratios q_supertrend q_coppock
q_inter_arrival q_range_vol
q_ppo q_dpo q_bop q_ultimate_osc q_hull_ma q_kst q_breadth q_mcclellan
q_cs_spread q_renko q_zigzag
q_chaikin_osc q_golden_cross q_runs_test q_gap_fill_rate
q_turn_of_month q_pv_corr q_vol_of_vol q_mean_reversion q_vpt
q_klinger q_nvi_pvi q_vol_cone q_new_returning q_anomaly_days
q_audience_overlap
q_vwma q_awesome_osc q_spearman q_tsi q_anchored_vwap
q_markov_stationary q_entry_exit q_omega q_info_ratio
q_sign_autocorr q_candle_anatomy q_session_cooccur
q_fractals q_rvi q_trend_intensity q_donchian_breakouts q_vzo
q_connors_rsi q_hurst q_choppiness q_stoch_rsi q_squeeze
q_elder_impulse q_growth_accounting q_rs_rating q_dema_tema
q_qstick q_cog q_envelope q_imi q_psy q_disparity q_alma q_camarilla
q_mcginley q_fisher q_var_cvar q_high_low_census q_stc
""".split()

OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "documents", "embeddings"]

# --text mode (r17, the r16 verdict's #3): the float-emitting TEXT
# family. The tick sweep earned every §4 r9/r10 parity rule at ~5x
# sf0.1 — this gives the text operators the same adversarial exposure:
# Zipf term skew, huge/empty/one-word docs, mixed-script and
# control-adjacent characters, dense stopword mass.
TEXT_FAMILY = """
q_bm25_search q_bm25_indexed q_bm25_and q_bm25_phrase q_bm25_phrase3
q_bm25_filtered q_bm25_batch q_hybrid_rrf q_doc_nll
q_surprisal q_token_entropy q_bigram_entropy q_readability q_zipf_slope
q_heaps_law q_quality_score q_quality_deciles q_compression_ratio
q_lexical_diversity q_source_kl q_js_divergence
q_bm25_deleted q_bm25_near
""".split()
# r18 additions: q_bm25_deleted (tombstoned index must equal the
# filtered-corpus scan — exact df/N/Σdl delta arithmetic under Zipf
# skew and empty/huge docs) and q_bm25_near (positional proximity —
# phrase queries q_bm25_phrase/3 already exercise the positional tf
# reconstruction since they serve from Bm25PosIndex).

TEXT_OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "embeddings"]


def gen_documents(rows: int, out: str) -> None:
    rng = np.random.default_rng(17)
    # vocabulary: corpus-like core + stopwords + mixed-script + numeric/
    # punct-heavy + control-adjacent tokens (NEVER U+001F itself — that
    # is the bpeVocab in-stream invariant, by design)
    core = ["spark", "join", "dup", "table", "scan", "merge", "sort",
            "hash", "row", "column", "batch", "stream", "query", "agg",
            "filter", "group", "window", "key", "value", "fast", "slow",
            "big", "small", "data", "line", "part", "order", "shuffle",
            "codegen", "plan", "stage", "task", "broadcast", "skew"]
    exotic = ["данные", "запрос", "таблица", "数据", "查询", "表格",
              "δεδομένα", "ερώτημα", "données", "requête", "größe",
              "straße", "naïve", "café", "ix", "xy",
              "ab", "­join", "ﬁle", "ﬂow",
              # invisible/whitespace-adjacent codepoints: VT is the
              # Java-\\s-vs-RE2 divergence char, NBSP/ZWSP/BOM ride
              # inside tokens (the corpus splits on U+0020 only)
              "vt", "n b", "z​w", "﻿bom"]
    numeric = ["3.14", "1e-9", "0xFF", "2024-01-01", "a=b+c;", "//x",
               "[1,2]", "{k:v}", "§4", "€99", "100%", "..."]
    stop = ["the", "a", "of", "and", "to", "in", "is", "it"]
    vocab = np.array(core + exotic + numeric + stop +
                     [f"w{i}" for i in range(2000)])
    # Zipf weights over the whole vocabulary (heavy skew)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf = 1.0 / ranks ** 1.1
    zipf /= zipf.sum()
    # doc lengths: log-normal core, plus deliberate degenerates
    lens = np.clip(np.exp(rng.normal(3.6, 1.0, rows)), 1, 800).astype(int)
    lens[rng.random(rows) < 0.002] = 0          # empty docs
    lens[rng.random(rows) < 0.004] = 1          # one-word docs
    huge = rng.random(rows) < 0.0008            # ~20 huge docs at 25k
    lens[huge] = 5000
    langs = np.array(["en", "de", "fr", "ru", "zh"])
    sources = np.array(["web", "books", "code", "wiki", "news"])
    texts = []
    for i in range(rows):
        n = lens[i]
        if n == 0:
            texts.append("")
            continue
        words = list(vocab[rng.choice(len(vocab), n, p=zipf)])
        # dense stopword runs in ~20% of docs (quality/stopword ratios)
        if rng.random() < 0.2:
            k = min(n, 30)
            words[:k] = list(rng.choice(stop, k))
        # plant the fixture query terms/phrases so BM25 has real hits
        r = rng.random()
        if r < 0.05:
            words[n // 2:n // 2] = ["spark", "join"]
        elif r < 0.08:
            words[n // 2:n // 2] = ["sort", "merge"]
        elif r < 0.09:
            words[n // 2:n // 2] = ["dup"]
        texts.append(" ".join(words))
    table = pa.table({
        "doc_id": pa.array(np.arange(rows, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs[rng.integers(0, 5, rows)], type=pa.string()),
        "source": pa.array(sources[rng.integers(0, 5, rows)],
                           type=pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    pq.write_table(table, out, version="2.6")


def gen_events(rows: int, out: str) -> None:
    rng = np.random.default_rng(9)
    types = np.array(["click", "purchase", "view", "signup", "error"])
    event_type = types[rng.integers(0, 5, rows)]
    # month-long tape, microsecond jitter, sorted append order
    base_us = np.int64(1704067200) * 1_000_000  # 2024-01-01 UTC
    span_us = np.int64(30 * 86400) * 1_000_000
    ts = np.sort(base_us + rng.integers(0, span_us, rows, dtype=np.int64))
    # ~1% exact (symbol, ts) ties: copy ts and type from the prior row
    tie = rng.random(rows) < 0.01
    tie[0] = False
    idx = np.arange(rows)
    prev = idx - 1
    ts[tie] = ts[prev[tie]]
    event_type[tie] = event_type[prev[tie]]
    # 2-dp grid prices; dense ±0.01 walks around round levels hit the
    # .5-decimal-boundary return quotients (200.01/200.00 - 1 = 5e-5)
    cents = rng.integers(1, 50001, rows)
    walk = rng.random(rows) < 0.30
    level = np.array([10000, 20000, 40000])[rng.integers(0, 3, walk.sum())]
    cents[walk] = level + rng.integers(-3, 4, walk.sum())
    value = cents / 100.0
    fourdp = rng.random(rows) < 0.10
    value[fourdp] = np.round(value[fourdp] + rng.integers(1, 100, fourdp.sum()) / 10000.0, 4)
    value[rng.random(rows) < 0.001] = 0.0
    user_id = rng.integers(0, 1500, rows)
    user_id[rng.random(rows) < 0.002] = 0  # zero volumes
    event_id = rng.permutation(rows) + 1  # random w.r.t. ts: tie-key stress
    props = np.char.add(np.char.add('{"k": ',
        rng.integers(0, 100, rows).astype(str)), "}")
    table = pa.table({
        "event_id": pa.array(event_id, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(user_id, type=pa.int64()),
        "event_type": pa.array(event_type, type=pa.string()),
        "value": pa.array(value, type=pa.float64()),
        "props": pa.array(props, type=pa.string()),
    })
    pq.write_table(table, out, version="2.6")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--text", action="store_true",
                    help="sweep the TEXT family over an adversarial "
                         "documents corpus instead of the tick family")
    ap.add_argument("--docs", type=int, default=25_000,
                    help="--text corpus size (~5x sf0.1)")
    ap.add_argument("--dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--gen-only", action="store_true")
    args = ap.parse_args()
    gen_dir = args.dir or ("/tmp/graft_textbig" if args.text
                           else "/tmp/graft_sfbig")
    out_dir = args.out or ("/tmp/verify_textbig" if args.text
                           else "/tmp/verify_big")

    shutil.rmtree(gen_dir, ignore_errors=True)
    os.makedirs(gen_dir)
    if args.text:
        gen_documents(args.docs, f"{gen_dir}/documents.parquet")
        others, family = TEXT_OTHER_TABLES, TEXT_FAMILY
        print(f"[sweep] generated {args.docs} adversarial docs at {gen_dir}")
    else:
        gen_events(args.rows, f"{gen_dir}/events.parquet")
        others, family = OTHER_TABLES, FAMILY
        print(f"[sweep] generated {args.rows} ticks at {gen_dir}")
    for t in others:  # untouched by the family; linked so the
        os.symlink(f"{args.base}/{t}.parquet",  # oracle views still bind
                   f"{gen_dir}/{t}.parquet")
    if args.gen_only:
        return 0

    shutil.rmtree(out_dir, ignore_errors=True)
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(family),
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    rc = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {gen_dir} {out_dir}"],
        cwd=REPO, env=env).returncode
    if rc != 0:
        print(f"[sweep] Verify failed rc={rc}")
        return rc
    return subprocess.run(
        [sys.executable, f"{REPO}/tools/compare_oracle.py",
         gen_dir, out_dir]).returncode


if __name__ == "__main__":
    sys.exit(main())
