#!/usr/bin/env python3
"""Laguerre RSI oracle support. Two roles:
(1) dev-loop validator: check the DuckDB WITH RECURSIVE replay of the
    recursion (operators/Laguerre.scala:33-93) is bit-exact against
    scala_rsi, the direct Python transliteration of the Scala loop
    (the winning SQL lives in SweepQueries.q47Sql);
(2) scala_rsi is IMPORTED by tools/compare.py to materialize the
    lag_regime prereq relation for q47's terminating oracle form
    (oracle_prereq.json) — the recursion runs iteratively here because
    the recursive CTE does not finish in practical time at sf0.1."""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

BARS_CTE = """
b0 AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id, value AS close,
    lag(value, 1) OVER w AS open,
    row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id)),
bars AS (
  SELECT event_type, ts_us, event_id, close, open, rn,
    greatest(open, close) * 1.001 AS high,
    least(open, close) * 0.999 AS low
  FROM b0 WHERE open IS NOT NULL)
"""

# per-bar precompute: laguerre index li (1-based over bars) and true range tr
LT_CTE = """
lt AS MATERIALIZED (
  SELECT event_type, ts_us, event_id, high, low, close, rn,
    row_number() OVER lw AS li,
    CASE WHEN lag(close) OVER lw IS NULL THEN high - low
         ELSE greatest(high, lag(close) OVER lw) - least(low, lag(close) OVER lw)
    END AS tr
  FROM bars
  WINDOW lw AS (PARTITION BY event_type ORDER BY ts_us, event_id)),
seed AS (
  SELECT event_type, 0 AS li,
    CAST(0.0 AS DOUBLE) AS tr_sum, CAST([] AS DOUBLE[]) AS atrs,
    first(close ORDER BY li) AS l0, first(close ORDER BY li) AS l1,
    first(close ORDER BY li) AS l2, first(close ORDER BY li) AS l3,
    CAST(0.0 AS DOUBLE) AS s_sum, CAST([] AS DOUBLE[]) AS raws,
    CAST(NULL AS DOUBLE) AS rsi
  FROM lt GROUP BY event_type)
"""

REC_CTE = """
rec AS (
  SELECT * FROM seed
  UNION ALL
  SELECT event_type, li, n_tr_sum, n_atrs, n_l0, n_l1, n_l2, n_l3,
    n_s_sum, n_raws, n_rsi
  FROM (
    SELECT cur.event_type AS event_type, cur.li AS li,
      prev.tr_sum + cur.tr - coalesce(old.tr, 0.0) AS n_tr_sum,
      n_tr_sum / least(cur.li, 32) AS atr,
      CASE WHEN len(prev.atrs) >= 32 THEN prev.atrs[2:] ELSE prev.atrs END
        || [atr] AS n_atrs,
      list_min(n_atrs) AS mn, list_max(n_atrs) AS mx,
      CASE WHEN mx > mn THEN (atr - mn) / (mx - mn) ELSE 0.5 END AS ratio,
      1.0 - (2.0 / 33.0) * (0.75 + (1.0 - 0.75) * ratio) AS g,
      (1.0 - g) * cur.close + g * prev.l0 AS n_l0,
      -g * n_l0 + prev.l0 + g * prev.l1 AS n_l1,
      -g * n_l1 + prev.l1 + g * prev.l2 AS n_l2,
      -g * n_l2 + prev.l2 + g * prev.l3 AS n_l3,
      (CASE WHEN n_l0 >= n_l1 THEN n_l0 - n_l1 ELSE 0.0 END)
        + (CASE WHEN n_l1 >= n_l2 THEN n_l1 - n_l2 ELSE 0.0 END)
        + (CASE WHEN n_l2 >= n_l3 THEN n_l2 - n_l3 ELSE 0.0 END) AS cu,
      (CASE WHEN n_l0 >= n_l1 THEN 0.0 ELSE n_l1 - n_l0 END)
        + (CASE WHEN n_l1 >= n_l2 THEN 0.0 ELSE n_l2 - n_l1 END)
        + (CASE WHEN n_l2 >= n_l3 THEN 0.0 ELSE n_l3 - n_l2 END) AS cd,
      CASE WHEN cu + cd > 0.0
           THEN least(1.0, greatest(0.0, cu / (cu + cd))) ELSE 0.0 END AS raw,
      prev.s_sum + raw
        - coalesce(CASE WHEN cur.li >= 6 THEN prev.raws[1] END, 0.0) AS n_s_sum,
      CASE WHEN len(prev.raws) >= 5 THEN prev.raws[2:] ELSE prev.raws END
        || [raw] AS n_raws,
      least(1.0, greatest(0.0, n_s_sum / least(cur.li, 5))) AS n_rsi
    FROM rec prev
    JOIN lt cur ON cur.event_type = prev.event_type AND cur.li = prev.li + 1
    LEFT JOIN lt old ON old.event_type = prev.event_type AND old.li = prev.li - 31
  ))
"""

SQL = ("WITH RECURSIVE " + BARS_CTE + "," + LT_CTE + "," + REC_CTE + """
SELECT l.event_type, l.ts_us, l.event_id, r.rsi,
  CASE WHEN r.rsi < 0.15 THEN 0 WHEN r.rsi > 0.85 THEN 2 ELSE 1 END AS regime
FROM rec r JOIN lt l ON l.event_type = r.event_type AND l.li = r.li
ORDER BY l.event_type, l.ts_us, l.event_id
""")


def scala_rsi(highs, lows, closes, atr_period=32, smoothing=5, offset=0.75):
    n = len(closes)
    out = [0.0] * n
    if n == 0:
        return out
    tr = [0.0] * n
    tr[0] = highs[0] - lows[0]
    for i in range(1, n):
        tr[i] = max(highs[i], closes[i - 1]) - min(lows[i], closes[i - 1])
    atr = [0.0] * n
    tr_sum = 0.0
    for i in range(n):
        tr_sum += tr[i]
        if i >= atr_period:
            tr_sum -= tr[i - atr_period]
        atr[i] = tr_sum / min(i + 1, atr_period)
    l0 = l1 = l2 = l3 = closes[0]
    raw = [0.0] * n
    for i in range(n):
        lo = max(0, i - atr_period + 1)
        mn = min(atr[lo:i + 1])
        mx = max(atr[lo:i + 1])
        ratio = (atr[i] - mn) / (mx - mn) if mx > mn else 0.5
        alpha = (2.0 / (atr_period + 1)) * (offset + (1.0 - offset) * ratio)
        g = 1.0 - alpha
        p = closes[i]
        l0p, l1p, l2p, l3p = l0, l1, l2, l3
        l0 = (1 - g) * p + g * l0p
        l1 = -g * l0 + l0p + g * l1p
        l2 = -g * l1 + l1p + g * l2p
        l3 = -g * l2 + l2p + g * l3p
        cu = cd = 0.0
        if l0 >= l1:
            cu += l0 - l1
        else:
            cd += l1 - l0
        if l1 >= l2:
            cu += l1 - l2
        else:
            cd += l2 - l1
        if l2 >= l3:
            cu += l2 - l3
        else:
            cd += l3 - l2
        raw[i] = min(1.0, max(0.0, cu / (cu + cd))) if cu + cd > 0 else 0.0
    s = 0.0
    for i in range(n):
        s += raw[i]
        if i >= smoothing:
            s -= raw[i - smoothing]
        out[i] = min(1.0, max(0.0, s / min(i + 1, smoothing)))
    return out


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    import time
    t0 = time.time()
    sql_rows = con.execute(SQL).fetchall()
    print(f"recursive SQL: {len(sql_rows)} rows in {time.time() - t0:.1f}s")

    bars = con.execute(
        "WITH " + BARS_CTE +
        " SELECT event_type, ts_us, event_id, high, low, close FROM bars"
        " ORDER BY event_type, ts_us, event_id").fetchall()
    py = {}
    from itertools import groupby
    for et, grp in groupby(bars, key=lambda r: r[0]):
        g = list(grp)
        rs = scala_rsi([r[3] for r in g], [r[4] for r in g], [r[5] for r in g])
        for r, v in zip(g, rs):
            py[(r[0], r[1], r[2])] = v

    n_exact = n_close = n_far = 0
    worst = 0.0
    regime_flips = 0
    for et, ts, eid, rsi, regime in sql_rows:
        pv = py[(et, ts, eid)]
        if rsi == pv:
            n_exact += 1
        else:
            d = abs(rsi - pv)
            worst = max(worst, d)
            if d < 1e-12:
                n_close += 1
            else:
                n_far += 1
        pr = 0 if pv < 0.15 else (2 if pv > 0.85 else 1)
        if pr != regime:
            regime_flips += 1
    print(f"exact: {n_exact}, close(<1e-12): {n_close}, far: {n_far}, "
          f"worst diff: {worst:.3e}, regime flips: {regime_flips}")


if __name__ == "__main__":
    main()
