"""DuckDB oracle SQL builders for the driver's correctness gate.

The iterative ranking family has no single-statement SQL equivalent, so the
oracle is a k-times-unrolled CTE chain (SURVEY §2.5) mirroring the
reference's exact update order (hubs from previous auths; auths from the
just-computed damped hubs; normalize both afterwards —
``/root/reference/src/base_hits.py:53-64``).

Float-parity discipline (SURVEY §7.3):

- beta-derived constants are computed in *Python* and embedded as
  ``CAST('<repr>' AS DOUBLE)`` so both engines start from bit-identical
  doubles (DuckDB would otherwise parse ``0.8`` as DECIMAL and round
  differently than the Spark ``lit(0.8)`` double).
- expression shapes mirror the Spark side op-for-op (e.g. SALSA divides as
  ``(1.0/d) * score``, not ``score/d`` — IEEE results can differ by 1 ulp).
- normalization uses window aggregates (``SUM(...) OVER ()``) so every CTE
  is referenced once and DuckDB's planner cannot exponentially inline the
  chain.
- final scores are rounded to 7 digits on BOTH sides; remaining
  cross-engine drift is summation order, ~1e-13 relative, far below the
  rounding step.
"""

from __future__ import annotations

ROUND_DIGITS = 7


def _dbl(x: float) -> str:
    """Embed a Python float as an exactly-parsed SQL double literal."""
    return f"CAST('{x!r}' AS DOUBLE)"


def duck_hex_to_long(expr: str, nchars: int = 8) -> str:
    """DuckDB SQL for parsing the first ``nchars`` hex digits of ``expr``
    as a BIGINT (DuckDB 1.0 has no strtol/conv; expand positionally).
    Mirrors Spark's ``conv(substring(x, 1, n), 16, 10)``."""
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ]
    return "(" + " + ".join(terms) + ")"


def duck_token_hash(expr: str) -> str:
    """DuckDB twin of functions.text.token_hash: hex8(md5(x)) as BIGINT."""
    return duck_hex_to_long(f"md5({expr})", 8)


def ranking_oracle(
    edges_sql: str,
    nodes_sql: str,
    *,
    family: str,
    k: int,
    weighted: bool = False,
    teleport: str | None = None,
    beta: float = 0.8,
    topic: str | None = None,
    subgraph: str | None = None,
    round_digits: int = ROUND_DIGITS,
) -> str:
    """Unrolled-CTE oracle for the HITS/SALSA iterative family.

    family: 'hits' (L2 norm, weight multiplier) or 'salsa' (L1 norm,
    degree-divided mutual update).  teleport: None | 'uniform' | 'topic'.
    subgraph: None | 'exclusive' | 'neighborhood' (applied before the
    iteration, exactly like graph.topic_induced / graph.neighborhood).
    """
    if family not in ("hits", "salsa"):
        raise ValueError(family)
    ctes: list[tuple[str, str]] = [("edges0", edges_sql), ("nodes0", nodes_sql)]

    if subgraph == "exclusive":
        ctes.append(("tnodes", f"SELECT id FROM nodes0 WHERE labels = '{topic}'"))
        ctes.append(
            (
                "edges",
                "SELECT e.* FROM edges0 e "
                "WHERE EXISTS (SELECT 1 FROM tnodes t WHERE t.id = e.src) "
                "AND EXISTS (SELECT 1 FROM tnodes t WHERE t.id = e.dst)",
            )
        )
        ctes.append(("nodes", f"SELECT * FROM nodes0 WHERE labels = '{topic}'"))
    elif subgraph == "neighborhood":
        ctes.append(("tnodes", f"SELECT id FROM nodes0 WHERE labels = '{topic}'"))
        ctes.append(
            (
                "edges",
                "SELECT e.* FROM edges0 e "
                "WHERE EXISTS (SELECT 1 FROM tnodes t WHERE t.id = e.src) "
                "OR EXISTS (SELECT 1 FROM tnodes t WHERE t.id = e.dst)",
            )
        )
        ctes.append(
            (
                "nodes",
                "SELECT n.* FROM nodes0 n "
                "WHERE EXISTS (SELECT 1 FROM edges e WHERE e.src = n.id OR e.dst = n.id)",
            )
        )
    elif subgraph is None:
        ctes.append(("edges", "SELECT * FROM edges0"))
        ctes.append(("nodes", "SELECT * FROM nodes0"))
    else:
        raise ValueError(subgraph)

    ctes.append(("nc", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes"))
    topic_init = False
    if teleport == "topic":
        ctes.append(
            ("tnc", f"SELECT CAST(COUNT(*) AS DOUBLE) AS nt FROM nodes WHERE labels = '{topic}'")
        )
        ctes.append(
            (
                "ind",
                f"SELECT id, CASE WHEN labels = '{topic}' THEN 1 ELSE 0 END AS ts FROM nodes",
            )
        )
        topic_init = family == "salsa"

    if family == "salsa":
        ctes.append(("indeg", "SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst"))
        ctes.append(("outdeg", "SELECT src, COUNT(*) AS d FROM edges GROUP BY src"))
        hub_from = "edges e JOIN indeg dd ON e.dst = dd.dst JOIN {prev} s ON e.dst = s.id"
        auth_from = "edges e JOIN outdeg dd ON e.src = dd.src JOIN {prev} s ON e.src = s.id"
        hub_expr = "SUM((1.0 / dd.d) * s.score)"
        auth_expr = "SUM((1.0 / dd.d) * s.score)"
        norm_div = "SUM(score) OVER ()"
        tele_denom = "(2.0 * (SELECT n FROM nc))"
        topic_denom = "(2.0 * (SELECT nt FROM tnc))"
    else:
        mult = "e.weight" if weighted else "1.0"
        hub_from = "edges e JOIN {prev} s ON e.dst = s.id"
        auth_from = "edges e JOIN {prev} s ON e.src = s.id"
        hub_expr = f"SUM({mult} * s.score)"
        auth_expr = f"SUM({mult} * s.score)"
        norm_div = "SQRT(SUM(score * score) OVER ())"
        tele_denom = "(SELECT n FROM nc)"
        topic_denom = "(SELECT nt FROM tnc)"

    # init (a0): uniform 1/sqrt(N) over all nodes, or SALSA topic init
    if topic_init:
        init = (
            "SELECT id, CASE WHEN labels = '{t}' THEN 1.0 / (2.0 * (SELECT nt FROM tnc)) "
            "ELSE CAST(0.0 AS DOUBLE) END AS score FROM nodes"
        ).format(t=topic)
    else:
        init = "SELECT id, 1.0 / SQRT((SELECT n FROM nc)) AS score FROM nodes"
    ctes.append(("a0", init))

    def damp_sql(src_cte: str) -> str:
        b = _dbl(beta)
        omb = _dbl(1.0 - beta)
        if teleport == "uniform":
            return (
                f"SELECT id, {b} * score + {omb} / {tele_denom} AS score FROM {src_cte}"
            )
        if teleport == "topic":
            return (
                f"SELECT x.id, CASE WHEN i.ts = 0 THEN {b} * x.score "
                f"ELSE {b} * x.score + {omb} / {topic_denom} END AS score "
                f"FROM {src_cte} x JOIN ind i ON x.id = i.id"
            )
        raise AssertionError

    for i in range(1, k + 1):
        prev_a = f"a{i - 1}"
        ctes.append(
            (
                f"h{i}r",
                f"SELECT e.src AS id, {hub_expr} AS score FROM "
                + hub_from.format(prev=prev_a)
                + " GROUP BY e.src",
            )
        )
        hub_in = f"h{i}r"
        if teleport:
            ctes.append((f"h{i}d", damp_sql(hub_in)))
            hub_in = f"h{i}d"
        ctes.append(
            (
                f"a{i}r",
                f"SELECT e.dst AS id, {auth_expr} AS score FROM "
                + auth_from.format(prev=hub_in)
                + " GROUP BY e.dst",
            )
        )
        auth_in = f"a{i}r"
        if teleport:
            ctes.append((f"a{i}d", damp_sql(auth_in)))
            auth_in = f"a{i}d"
        ctes.append((f"h{i}", f"SELECT id, score / {norm_div} AS score FROM {hub_in}"))
        ctes.append((f"a{i}", f"SELECT id, score / {norm_div} AS score FROM {auth_in}"))

    with_clause = ",\n".join(f"{name} AS ({sql})" for name, sql in ctes)
    d = round_digits
    return (
        f"WITH {with_clause}\n"
        f"SELECT 'hub' AS kind, id, ROUND(CAST(score AS DOUBLE), {d}) AS score FROM h{k}\n"
        f"UNION ALL\n"
        f"SELECT 'auth' AS kind, id, ROUND(CAST(score AS DOUBLE), {d}) AS score FROM a{k}"
    )


def pagerank_oracle(
    edges_sql: str,
    nodes_sql: str,
    *,
    k: int,
    beta: float = 0.85,
    weighted: bool = False,
    round_digits: int = ROUND_DIGITS,
) -> str:
    """Unrolled-CTE oracle for textbook PageRank (operators/ranking.py
    pagerank): ``p <- beta * M^T p + (1-beta)/N`` over EVERY node (left
    join pins the full node list so teleport reaches edge-less nodes),
    then L1 renormalization per iteration absorbing the dangling leak.

    Float parity mirrors the Spark side op-for-op: out-weights are
    ``CAST(COUNT(*) AS DOUBLE)`` (== Spark's SUM of 1.0d), the column
    multiplier is ``1.0 / ow`` (same IEEE division), beta constants are
    Python-computed doubles embedded exactly, and the teleport term is
    the same ``(1-beta)/N`` double division both engines perform on
    exact operands.
    """
    b = _dbl(beta)
    omb = _dbl(1.0 - beta)
    ctes: list[tuple[str, str]] = [("edges0", edges_sql), ("nodes0", nodes_sql)]
    ctes.append(("nc", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes0"))
    if weighted:
        ctes.append(
            (
                "outw",
                "SELECT src, SUM(CAST(weight AS DOUBLE)) AS ow FROM edges0 GROUP BY src",
            )
        )
        mult = "CAST(e.weight AS DOUBLE) / o.ow"
    else:
        ctes.append(
            ("outw", "SELECT src, CAST(COUNT(*) AS DOUBLE) AS ow FROM edges0 GROUP BY src")
        )
        mult = "1.0 / o.ow"
    ctes.append(
        ("ea", f"SELECT e.src, e.dst, {mult} AS mult FROM edges0 e JOIN outw o ON e.src = o.src")
    )
    ctes.append(("p0", "SELECT id, 1.0 / (SELECT n FROM nc) AS score FROM nodes0"))
    for i in range(1, k + 1):
        ctes.append(
            (
                f"c{i}",
                f"SELECT ea.dst AS id, SUM(ea.mult * p.score) AS c "
                f"FROM ea JOIN p{i - 1} p ON ea.src = p.id GROUP BY ea.dst",
            )
        )
        ctes.append(
            (
                f"r{i}",
                f"SELECT n.id, {b} * COALESCE(c.c, CAST(0.0 AS DOUBLE)) "
                f"+ {omb} / (SELECT n FROM nc) AS score "
                f"FROM nodes0 n LEFT JOIN c{i} c ON n.id = c.id",
            )
        )
        ctes.append((f"p{i}", f"SELECT id, score / SUM(score) OVER () AS score FROM r{i}"))
    with_clause = ",\n".join(f"{name} AS ({sql})" for name, sql in ctes)
    return (
        f"WITH {with_clause}\n"
        f"SELECT id, ROUND(CAST(score AS DOUBLE), {round_digits}) AS score FROM p{k}"
    )


def ppr_oracle(
    edges_sql: str,
    nodes_sql: str,
    *,
    topic: str,
    k: int,
    beta: float = 0.85,
    weighted: bool = False,
    round_digits: int = ROUND_DIGITS,
) -> str:
    """Unrolled-CTE oracle for personalized PageRank (operators/
    ranking.py personalized_pagerank): PageRank's recurrence with the
    teleport mass uniform over the seed set (nodes labeled ``topic``)
    and p0 = e_S.  Float parity as in :func:`pagerank_oracle`; the seed
    teleport ``(1-beta)/|S|`` is the same IEEE division of exact
    operands on both engines."""
    b = _dbl(beta)
    omb = _dbl(1.0 - beta)
    ctes: list[tuple[str, str]] = [("edges0", edges_sql), ("nodes0", nodes_sql)]
    ctes.append(("seeds", f"SELECT id FROM nodes0 WHERE labels = '{topic}'"))
    ctes.append(("sc", "SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM seeds"))
    if weighted:
        ctes.append(
            (
                "outw",
                "SELECT src, SUM(CAST(weight AS DOUBLE)) AS ow FROM edges0 GROUP BY src",
            )
        )
        mult = "CAST(e.weight AS DOUBLE) / o.ow"
    else:
        ctes.append(
            ("outw", "SELECT src, CAST(COUNT(*) AS DOUBLE) AS ow FROM edges0 GROUP BY src")
        )
        mult = "1.0 / o.ow"
    ctes.append(
        ("ea", f"SELECT e.src, e.dst, {mult} AS mult FROM edges0 e JOIN outw o ON e.src = o.src")
    )
    ctes.append(
        (
            "p0",
            "SELECT n.id, CASE WHEN s.id IS NOT NULL "
            "THEN 1.0 / (SELECT ns FROM sc) ELSE CAST(0.0 AS DOUBLE) END AS score "
            "FROM nodes0 n LEFT JOIN seeds s ON n.id = s.id",
        )
    )
    for i in range(1, k + 1):
        ctes.append(
            (
                f"c{i}",
                f"SELECT ea.dst AS id, SUM(ea.mult * p.score) AS c "
                f"FROM ea JOIN p{i - 1} p ON ea.src = p.id GROUP BY ea.dst",
            )
        )
        ctes.append(
            (
                f"r{i}",
                f"SELECT n.id, {b} * COALESCE(c.c, CAST(0.0 AS DOUBLE)) "
                f"+ CASE WHEN s.id IS NOT NULL THEN {omb} / (SELECT ns FROM sc) "
                f"ELSE CAST(0.0 AS DOUBLE) END AS score "
                f"FROM nodes0 n LEFT JOIN seeds s ON n.id = s.id "
                f"LEFT JOIN c{i} c ON n.id = c.id",
            )
        )
        ctes.append((f"p{i}", f"SELECT id, score / SUM(score) OVER () AS score FROM r{i}"))
    with_clause = ",\n".join(f"{name} AS ({sql})" for name, sql in ctes)
    return (
        f"WITH {with_clause}\n"
        f"SELECT id, ROUND(CAST(score AS DOUBLE), {round_digits}) AS score FROM p{k}"
    )


def salsa_simplified_oracle(
    edges_sql: str,
    nodes_sql: str | None = None,
    *,
    weighted: bool = False,
    subgraph: str | None = None,
    topic: str | None = None,
    round_digits: int = ROUND_DIGITS,
) -> str:
    """Oracle for simplified (non-iterative) SALSA: degree ranking,
    L1-normalized (``base_salsa.py:38-42``; weighted:
    ``weighted_salsa.py:41-45``); optionally on the neighborhood subgraph
    (``query_dependent_salsa.py:39-62``)."""
    ctes: list[tuple[str, str]] = [("edges0", edges_sql)]
    if subgraph == "neighborhood":
        ctes.append(("nodes0", nodes_sql))
        ctes.append(("tnodes", f"SELECT id FROM nodes0 WHERE labels = '{topic}'"))
        ctes.append(
            (
                "edges",
                "SELECT e.* FROM edges0 e "
                "WHERE EXISTS (SELECT 1 FROM tnodes t WHERE t.id = e.src) "
                "OR EXISTS (SELECT 1 FROM tnodes t WHERE t.id = e.dst)",
            )
        )
    elif subgraph is None:
        ctes.append(("edges", "SELECT * FROM edges0"))
    else:
        raise ValueError(subgraph)
    score = "CAST(SUM(weight) AS DOUBLE)" if weighted else "CAST(COUNT(*) AS DOUBLE)"
    ctes.append(("hub_deg", f"SELECT src AS id, {score} AS score FROM edges GROUP BY src"))
    ctes.append(("auth_deg", f"SELECT dst AS id, {score} AS score FROM edges GROUP BY dst"))
    with_clause = ",\n".join(f"{name} AS ({sql})" for name, sql in ctes)
    d = round_digits
    return (
        f"WITH {with_clause}\n"
        f"SELECT 'hub' AS kind, id, ROUND(CAST(score / SUM(score) OVER () AS DOUBLE), {d}) AS score FROM hub_deg\n"
        f"UNION ALL\n"
        f"SELECT 'auth' AS kind, id, ROUND(CAST(score / SUM(score) OVER () AS DOUBLE), {d}) AS score FROM auth_deg"
    )
