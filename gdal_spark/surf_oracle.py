"""Generator for the surf_match DuckDB oracle (imported by
gdal_spark.queries). Replays, in SQL: the 64x64 blob image and its
x+7 circular shift, octave-1 SURF detection (as the surf_keypoints
oracle), the 64-d Haar descriptors, and MatchFeaturePoints'
sequential greedy as a recursive CTE — best2 uses the closed form
min{d_j : j first OR d_j > exclusive-prefix-min d} which is exactly
the reference's evolving-best update rule (gdal_simplesurf.cpp:
355-364), and exclusivity rides as a growing matched list."""

from __future__ import annotations

H = W = 64
OCT = 1
SCALE = 2


def _val(s, r, c):
    return (
        f"CASE WHEN ({r}) >= 0 AND ({r}) < {H} AND ({c}) >= 0 AND ({c}) < {W} "
        f"THEN ia_{s}.a[({r}) * {W} + ({c}) + 1] ELSE 0.0 END"
    )


def _rect(s, r, c, w, h):
    lt_r = f"(CASE WHEN ({r}) <= {H} THEN ({r}) - 1 ELSE -1 END)"
    lt_c = f"(CASE WHEN ({c}) <= {W} THEN ({c}) - 1 ELSE -1 END)"
    rb_r = f"(CASE WHEN ({r}) + {h - 1} < {H} THEN ({r}) + {h - 1} ELSE {H - 1} END)"
    rb_c = f"(CASE WHEN ({c}) + {w - 1} < {W} THEN ({c}) + {w - 1} ELSE {W - 1} END)"
    a = f"CASE WHEN {lt_r} >= 0 AND {lt_c} >= 0 THEN {_val(s, lt_r, lt_c)} ELSE 0.0 END"
    b = f"CASE WHEN {lt_r} >= 0 AND {rb_c} >= 0 THEN {_val(s, lt_r, rb_c)} ELSE 0.0 END"
    cc = f"CASE WHEN {rb_r} >= 0 AND {rb_c} >= 0 THEN {_val(s, rb_r, rb_c)} ELSE 0.0 END"
    d = f"CASE WHEN {rb_r} >= 0 AND {lt_c} >= 0 THEN {_val(s, rb_r, lt_c)} ELSE 0.0 END"
    return f"GREATEST(({a}) + ({cc}) - ({b}) - ({d}), 0.0)"


def _image_ctes(s: str, shift: int) -> str:
    if shift:
        gx = f"(((grid.x - {shift}) % {W}) + {W}) % {W}"
    else:
        gx = "grid.x"
    parts = [
        f"img_{s} AS (SELECT grid.y, grid.x, "
        f"CAST((({gx})*3 + grid.y*5) % 7 * 3 AS DOUBLE) + COALESCE((SELECT "
        f"SUM(floor(1800.0 / (9 + ({gx} - cs.cx)*({gx} - cs.cx) + (grid.y - cs.cy)*(grid.y - cs.cy)))) "
        f"FROM cs), 0.0) AS v FROM grid)",
        f"rc_{s} AS (SELECT y, x, SUM(v) OVER (PARTITION BY y ORDER BY x ROWS UNBOUNDED PRECEDING) AS rv FROM img_{s})",
        f"ii_{s} AS (SELECT y, x, SUM(rv) OVER (PARTITION BY x ORDER BY y ROWS UNBOUNDED PRECEDING) AS ii FROM rc_{s})",
        f"ia_{s} AS MATERIALIZED (SELECT list(ii ORDER BY y * {W} + x) AS a FROM ii_{s})",
    ]
    for k in range(1, 5):
        fs = 3 * (2 ** OCT) * k + 1
        radius = (fs - 1) // 2
        lobe = fs // 3
        lp = 2 * lobe - 1
        norm = fs * fs
        dxx = (
            f"(({_rect(s, 'p.y - ' + str(lobe - 1), 'p.x - ' + str(radius), fs, lp)}) - "
            f"3 * ({_rect(s, 'p.y - ' + str(lobe - 1), 'p.x - ' + str((lobe - 1) // 2), lobe, lp)})) / {norm}"
        )
        dyy = (
            f"(({_rect(s, 'p.y - ' + str(radius), 'p.x - ' + str(lobe + 1), lp, fs)}) - "
            f"3 * ({_rect(s, 'p.y - ' + str(lobe - 1), 'p.x - ' + str(lobe - 1), lp, lobe)})) / {norm}"
        )
        dxy = (
            f"(({_rect(s, 'p.y - ' + str(lobe), 'p.x - ' + str(lobe), lobe, lobe)}) + "
            f"({_rect(s, 'p.y + 1', 'p.x + 1', lobe, lobe)}) - "
            f"({_rect(s, 'p.y - ' + str(lobe), 'p.x + 1', lobe, lobe)}) - "
            f"({_rect(s, 'p.y + 1', 'p.x - ' + str(lobe), lobe, lobe)})) / {norm}"
        )
        parts.append(
            f"raw_{s}_{k} AS (SELECT p.y, p.x, {dxx} AS dxx, {dyy} AS dyy, {dxy} AS dxy "
            f"FROM grid p, ia_{s} WHERE p.y BETWEEN {radius} AND {H - radius} "
            f"AND p.x BETWEEN {radius} AND {W - radius})"
        )
        parts.append(
            f"det_{s}_{k} AS (SELECT y, x, dxx * dyy - 0.9 * 0.9 * dxy * dxy AS det, "
            f"CASE WHEN dxx + dyy >= 0 THEN 1 ELSE -1 END AS sgn FROM raw_{s}_{k})"
        )
    ex = []
    for k in range(0, 2):
        bot, mid, top = f"det_{s}_{k + 1}", f"det_{s}_{k + 2}", f"det_{s}_{k + 3}"
        top_fs = 3 * (2 ** OCT) * (k + 3) + 1
        tr = (top_fs - 1) // 2
        ex.append(
            f"SELECT {k + 2} AS interval, m.y, m.x, m.sgn FROM {mid} m "
            f"WHERE m.y > {tr} AND m.x > {tr} AND m.y + {tr} < {H} AND m.x + {tr} < {W} "
            f"AND m.det >= 0.001 "
            f"AND NOT EXISTS (SELECT 1 FROM {top} t WHERE t.y BETWEEN m.y - 1 AND m.y + 1 "
            f"AND t.x BETWEEN m.x - 1 AND m.x + 1 AND t.det >= m.det) "
            f"AND NOT EXISTS (SELECT 1 FROM {bot} b WHERE b.y BETWEEN m.y - 1 AND m.y + 1 "
            f"AND b.x BETWEEN m.x - 1 AND m.x + 1 AND b.det >= m.det) "
            f"AND NOT EXISTS (SELECT 1 FROM {mid} q WHERE q.y BETWEEN m.y - 1 AND m.y + 1 "
            f"AND q.x BETWEEN m.x - 1 AND m.x + 1 AND (q.y != m.y OR q.x != m.x) "
            f"AND q.det >= m.det)"
        )
    parts.append(
        f"kp_{s} AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY interval, y, x) - 1 AS i, "
        f"y, x, sgn FROM ({' UNION ALL '.join(ex)}))"
    )
    # descriptors: scale 2 -> haar 4, desc_side 40, quad_step 10, sub 2
    dx = (
        f"({_rect(s, 'cr', 'cc + 2', 2, 4)}) - ({_rect(s, 'cr', 'cc', 2, 4)})"
    )
    dy = (
        f"({_rect(s, 'cr + 2', 'cc', 4, 2)}) - ({_rect(s, 'cr', 'cc', 4, 2)})"
    )
    parts.append(
        f"hw_{s} AS (SELECT k.i, q.q, {dx} AS dx, {dy} AS dy FROM kp_{s} k, ia_{s}, "
        "(SELECT unnest(generate_series(0, 15)) AS q) q, "
        "(SELECT unnest(generate_series(0, 24)) AS sub) sub, "
        "LATERAL (SELECT k.y - 20 + CAST(q.q // 4 AS BIGINT) * 10 + CAST(sub.sub // 5 AS BIGINT) * 2 + 1 - 2 AS cr, "
        "k.x - 20 + CAST(q.q % 4 AS BIGINT) * 10 + CAST(sub.sub % 5 AS BIGINT) * 2 + 1 - 2 AS cc) pos)"
    )
    parts.append(
        f"qd_{s} AS MATERIALIZED (SELECT i, q, SUM(dx) AS dxs, SUM(dy) AS dys, "
        f"SUM(abs(dx)) AS adx, SUM(abs(dy)) AS ady FROM hw_{s} GROUP BY i, q)"
    )
    parts.append(
        f"dsc_{s} AS MATERIALIZED (SELECT i, q * 4 + 0 AS comp, dxs AS val FROM qd_{s} "
        f"UNION ALL SELECT i, q * 4 + 1, dys FROM qd_{s} "
        f"UNION ALL SELECT i, q * 4 + 2, adx FROM qd_{s} "
        f"UNION ALL SELECT i, q * 4 + 3, ady FROM qd_{s})"
    )
    return ", ".join(parts)


def surf_match_oracle(docs_g_cte: str, centers_sql: str) -> str:
    ctes = (
        f"WITH RECURSIVE g AS ({docs_g_cte}), "
        f"cs AS ({centers_sql}), "
        "grid AS (SELECT x.x, y.y FROM (SELECT unnest(generate_series(0,63)) AS x) x, "
        "(SELECT unnest(generate_series(0,63)) AS y) y), "
        + _image_ctes("one", 0)
        + ", "
        + _image_ctes("two", 7)
        + ", "
        # driving side: reference picks the SMALLER collection; on a
        # tie the SECOND drives (minLength == len_2 branch)
        "sw AS MATERIALIZED (SELECT (SELECT COUNT(*) FROM kp_two) <= (SELECT COUNT(*) FROM kp_one) AS drive2), "
        "pa AS MATERIALIZED (SELECT k.* FROM kp_two k, sw WHERE sw.drive2 "
        "UNION ALL SELECT k.* FROM kp_one k, sw WHERE NOT sw.drive2), "
        "pb AS MATERIALIZED (SELECT k.* FROM kp_one k, sw WHERE sw.drive2 "
        "UNION ALL SELECT k.* FROM kp_two k, sw WHERE NOT sw.drive2), "
        "da AS MATERIALIZED (SELECT d.* FROM dsc_two d, sw WHERE sw.drive2 "
        "UNION ALL SELECT d.* FROM dsc_one d, sw WHERE NOT sw.drive2), "
        "db AS MATERIALIZED (SELECT d.* FROM dsc_one d, sw WHERE sw.drive2 "
        "UNION ALL SELECT d.* FROM dsc_two d, sw WHERE NOT sw.drive2), "
        "dist AS MATERIALIZED (SELECT a.i AS ai, b.i AS bi, "
        "sqrt(SUM((da.val - db.val) * (da.val - db.val))) AS d "
        "FROM pa a JOIN pb b ON a.sgn = b.sgn "
        "JOIN da ON da.i = a.i JOIN db ON db.i = b.i AND db.comp = da.comp "
        "GROUP BY a.i, b.i), "
        "na AS MATERIALIZED (SELECT COUNT(*) AS n FROM pa), "
        # per-driving-point candidate lists in bi order (materialized:
        # the recursion must not re-run the descriptor chain per step)
        "cl AS MATERIALIZED (SELECT ai, list(bi ORDER BY bi) AS bis, "
        "list(d ORDER BY bi) AS ds FROM dist GROUP BY ai), "
        # sequential greedy with exclusivity (gdal_simplesurf.cpp:322-381)
        # as pure list-lambda scalar math — best2 = min over candidates
        # that are first-in-scan or exceed the exclusive prefix-min,
        # exactly the reference's evolving-best update rule
        "rec AS ("
        "SELECT CAST(-1 AS BIGINT) AS step, CAST([] AS BIGINT[]) AS matched, "
        "CAST([] AS BIGINT[]) AS mis, CAST([] AS BIGINT[]) AS mjs "
        "UNION ALL "
        "SELECT r.step + 1, "
        "CASE WHEN h.ok THEN list_append(r.matched, h.bj) ELSE r.matched END, "
        "CASE WHEN h.ok THEN list_append(r.mis, r.step + 1) ELSE r.mis END, "
        "CASE WHEN h.ok THEN list_append(r.mjs, h.bj) ELSE r.mjs END "
        "FROM rec r CROSS JOIN na "
        "LEFT JOIN cl ON cl.ai = r.step + 1, "
        "LATERAL (SELECT list_filter(range(1, len(cl.bis) + 1), "
        "i -> NOT list_contains(r.matched, cl.bis[i])) AS keep) k1, "
        "LATERAL (SELECT list_transform(k1.keep, i -> cl.ds[i]) AS fd, "
        "list_transform(k1.keep, i -> cl.bis[i]) AS fb) k2, "
        "LATERAL (SELECT list_aggregate(k2.fd, 'min') AS best, "
        "CASE WHEN len(k2.fd) > 0 THEN k2.fb[list_position(k2.fd, list_aggregate(k2.fd, 'min'))] END AS bj, "
        "list_aggregate(list_transform(range(1, len(k2.fd) + 1), "
        "i -> CASE WHEN i = 1 OR k2.fd[i] > list_aggregate(list_slice(k2.fd, 1, i - 1), 'min') "
        "THEN k2.fd[i] ELSE NULL END), 'min') AS best2) k3, "
        "LATERAL (SELECT COALESCE(k3.best IS NOT NULL AND k3.best2 IS NOT NULL "
        "AND k3.best2 > 0 AND k3.best / k3.best2 < 0.8, FALSE) AS ok, k3.bj AS bj) h "
        "WHERE r.step + 1 < na.n), "
        "fin AS (SELECT mis, mjs FROM rec, na WHERE step = na.n - 1), "
        "pairs AS (SELECT unnest(mis) AS ai, unnest(mjs) AS bi FROM fin) "
        # first-image point first in the output, regardless of swap
        "SELECT CAST(CASE WHEN sw.drive2 THEN b.x ELSE a.x END AS BIGINT) AS x1, "
        "CAST(CASE WHEN sw.drive2 THEN b.y ELSE a.y END AS BIGINT) AS y1, "
        "CAST(CASE WHEN sw.drive2 THEN a.x ELSE b.x END AS BIGINT) AS x2, "
        "CAST(CASE WHEN sw.drive2 THEN a.y ELSE b.y END AS BIGINT) AS y2 "
        "FROM pairs JOIN pa a ON a.i = pairs.ai JOIN pb b ON b.i = pairs.bi, sw"
    )
    return ctes
