"""Link-graph analytics: host-level PageRank as an iterative
DataFrame-Pregel loop.

Web-crawl curation pipelines use link-graph centrality as a quality /
crawl-priority signal (Common Crawl publishes host-level harmonic
centrality and PageRank rankings; OPIC and its descendants drive
frontier scheduling). The driver testdata has no link table, so the
query binding synthesises a deterministic host graph from ``documents``
with closed-form integer expressions evaluated identically by Spark and
the DuckDB oracle (same pattern as the PII-injection oracle in
__spark_entry__.py) — the operator itself takes any (src, dst) edge
DataFrame.

EXACTNESS DESIGN (shared with operators/quality.py): the entire
iteration runs in BIGINT "nano-rank" fixed point. Rank mass starts at
``1e9 // n``; each step is

    share(u)  = r(u) DIV deg(u)                    -- integer division
    agg(v)    = SUM share(u) over in-edges          -- exact integer sum
    dangling  = SUM r(u) over deg(u)=0 nodes, DIV n
    r'(v)     = (15*1e9) DIV (100*n)  +  (85 * (agg(v) + dangling)) DIV 100

i.e. damping d = 0.85 expressed as the rational 85/100 with explicit
floor division. Every operation is integer arithmetic: no
floating-point sum ordering, no ULP drift across 5 iterations, no
rounding boundaries — the Spark result and the DuckDB unrolled-CTE
oracle agree bit-for-bit. The floor losses bias each rank down by
< n·5e-9 relative; acceptable for a ranking signal and fully specified.

SCALE NOTES: the edge relation is hash-partitioned by ``src`` ONCE and
persisted; every iteration's rank join then reuses that partitioning
(ranks are shuffled to the edges, never the reverse — edges outnumber
nodes 10-100x on web graphs). Per-iteration state is one (host, r)
BIGINT pair per node. The dangling-mass term is a global 1-row
aggregate crossJoin-broadcast back — map-side, no extra exchange of the
rank relation. Five fixed iterations unroll into one Catalyst plan, so
``pagerank`` stays a pure lazy DataFrame (the queries() contract);
long-horizon convergence runs would localCheckpoint every ~5 rounds to
cap lineage, exactly as plans/driver.py does for the crawl frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000


def synth_host_edges(docs: DataFrame, n_hosts: int = 211) -> DataFrame:
    """Deterministic synthetic host graph: each document contributes two
    edges (plus a third from every 3rd doc) whose endpoints mix both the
    low (mod) and high (div) bits of doc_id, so out-degrees vary by
    host. Self-loops removed, edges deduplicated. Mirrored verbatim in
    the DuckDB oracle."""
    # integer-only expressions (DIV / %): exact and identical in DuckDB
    nh = n_hosts
    d = docs.select("doc_id")
    e1 = d.selectExpr(
        f"doc_id % {nh} AS src",
        f"(doc_id DIV {nh} * 13 + doc_id * 31 + 7) % {nh} AS dst",
    )
    e2 = d.selectExpr(
        f"(doc_id * 7 + 1) % {nh} AS src",
        f"(doc_id DIV {nh} * 29 + doc_id * 17 + 3) % {nh} AS dst",
    )
    e3 = d.filter((F.col("doc_id") % 3) == 0).selectExpr(
        f"(doc_id * 13 + 5) % {nh} AS src",
        f"(doc_id DIV {nh} * 37 + doc_id * 41 + 11) % {nh} AS dst",
    )
    return (
        e1.unionAll(e2).unionAll(e3)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(edges: DataFrame, iters: int = 5) -> DataFrame:
    """Integer fixed-point PageRank (see module doc). Input: (src, dst)
    integer edges, deduplicated. Output: one row per node with its
    out-degree and rank in nano units plus the rounded double.

    Loop shape mirrors hits()/pagerank_personalized(): the static
    relations (edges-with-out-degree partitioned by src, the per-node
    state) are built once and lazily localCheckpoint-ed, and each
    iteration's rank relation is a bare (host, r) BIGINT pair, itself
    pinned at definition because it has two consumers (the share join
    and the dangling sum) — without the pin the unrolled lazy plan
    re-derives every earlier iteration twice per level (measured 52s
    -> ~5s at sf0.1/local[32] when this was restructured in r5;
    pagerank_personalized showed the same ratio)."""
    from don_crawler_spark.plans.adaptive import adaptive_partitions

    # size-derived loop-relation width (guide §2.2): a sandbox host graph
    # iterates on 1-partition pair relations; a multi-TB edge list gets
    # thousands — same code path, no session-constant partitioning
    npart = adaptive_partitions(edges)
    # partition the (static) edge relation by src once; every iteration's
    # rank join reuses this layout, so only the small rank relation moves
    edges = edges.repartition(npart, "src").persist()

    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionAll(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # static (src, dst, deg) message relation: deg is computed FROM the
    # src-partitioned edges, so this join reuses the layout
    e_deg = edges.join(deg, "src").localCheckpoint(eager=False)
    n1 = nodes.agg(F.count("*").alias("n"))
    # static per-node state: host, out-degree (0 = dangling), node count
    # — coalesced to the size-derived width before the pin (the session's
    # shuffle.partitions is sized for big scans; AQE cannot coalesce a
    # checkpointed RDD after the fact)
    nd = (
        nodes.join(deg, nodes["host"] == deg["src"], "left")
        .select("host", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
        .crossJoin(F.broadcast(n1))
        .coalesce(npart)
        .localCheckpoint(eager=False)
    )
    dang_hosts = nd.filter(F.col("deg") == 0).select("host")

    ranks = nd.select("host", F.expr(f"{NANO} DIV n").alias("r"))
    for _ in range(iters):
        # two consumers (share join + dangling sum): pin the pair
        # relation to one computation, lazily, at definition
        ranks = ranks.coalesce(npart).localCheckpoint(eager=False)
        # messages: each non-dangling node splits its rank over out-edges
        shares = (
            e_deg.join(ranks, e_deg["src"] == ranks["host"])
            .select(F.col("dst"), F.expr("r DIV deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        dang = (
            ranks.join(dang_hosts, "host", "left_semi")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dsum"))
        )
        ranks = (
            nd.join(shares, nd["host"] == shares["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                # 15*NANO precomputed in Python: as two INT literals the
                # product overflows int32 under ANSI mode
                F.expr(
                    f"{15 * NANO}L DIV (100 * n)"
                    " + (85 * (coalesce(s, 0) + dsum DIV n)) DIV 100"
                ).alias("r"),
            )
        )
    meta = nd.select(F.col("host").alias("m_host"), "deg")
    return ranks.join(meta, ranks["host"] == meta["m_host"]).select(
        F.col("host").cast("int").alias("host"),
        F.col("deg").cast("int").alias("out_deg"),
        F.col("r").alias("pagerank_nano"),
        F.round(F.col("r") / F.lit(float(NANO)), 6).alias("pagerank"),
    )


def opic(edges: DataFrame, iters: int = 5) -> DataFrame:
    """OPIC — Adaptive On-Line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003): the frontier-scheduling importance score
    computed *during* a crawl, without waiting for a PageRank
    convergence pass. Each page holds ``cash``; when processed it banks
    its cash into ``history`` and distributes it equally over its
    out-links (dangling pages pay a virtual node that redistributes
    uniformly). A page's importance estimate is proportional to the
    cash it has accumulated over time — crawl schedulers fetch the
    highest-cash frontier pages first. This is the batch-synchronous
    variant: every round, every node banks and distributes at once,
    which is the form a round-based Spark crawl would actually run
    between frontier rounds.

    Same integer fixed-point discipline as pagerank (module doc): total
    cash starts at ~NANO (``NANO DIV n`` each), every step is BIGINT
    floor arithmetic (`c DIV deg` shares, `dsum DIV n` virtual
    redistribution), so the unrolled-CTE DuckDB oracle matches
    bit-for-bit. ``importance`` normalizes ``history + cash`` by the
    ``(iters + 1) * NANO`` total that has entered the system.

    Loop shape: the pair-relation discipline (see pagerank) — static
    edges+degree / node-state / dangling-set relations pinned once;
    each iteration shuffles only the (host, cash, history) BIGINT
    triple, pinned at definition (three consumers: share join,
    dangling sum, and the bank step reads its own prior state).
    """
    from don_crawler_spark.plans.adaptive import adaptive_partitions

    # size-derived loop-relation width (guide §2.2; see pagerank)
    npart = adaptive_partitions(edges)
    edges = edges.repartition(npart, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionAll(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = edges.join(deg, "src").localCheckpoint(eager=False)
    nn = nodes.agg(F.count("*").alias("n"))
    nd = (
        nodes.join(deg, nodes["host"] == deg["src"], "left")
        .select("host", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
        .crossJoin(F.broadcast(nn))
        .coalesce(npart)
        .localCheckpoint(eager=False)
    )
    dang_hosts = nd.filter(F.col("deg") == 0).select("host")

    state = nd.select(
        "host",
        F.expr(f"{NANO} DIV n").alias("c"),
        F.lit(0).cast("long").alias("h"),
    )
    for _ in range(iters):
        state = state.coalesce(npart).localCheckpoint(eager=False)
        shares = (
            e_deg.join(state, e_deg["src"] == state["host"])
            .select(F.col("dst"), F.expr("c DIV deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        dang = (
            state.join(dang_hosts, "host", "left_semi")
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("dsum"))
            .crossJoin(F.broadcast(nd.select("n").limit(1)))
            .select(F.expr("dsum DIV n").alias("dshare"))
        )
        # bank: h' = h + c (the node is "processed"); receive: c' =
        # in-shares + the virtual node's uniform redistribution
        state = (
            state.join(shares, state["host"] == shares["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                F.expr("coalesce(s, 0) + dshare").alias("c"),
                F.expr("h + c").alias("h"),
            )
        )
    meta = nd.select(F.col("host").alias("m_host"), "deg")
    total = float(NANO * (iters + 1))
    return state.join(meta, state["host"] == meta["m_host"]).select(
        F.col("host").cast("int").alias("host"),
        F.col("deg").cast("int").alias("out_deg"),
        F.col("c").alias("cash_nano"),
        F.col("h").alias("history_nano"),
        F.round((F.col("h") + F.col("c")) / F.lit(total), 6).alias(
            "importance"
        ),
    )


def seed_distance(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 6
) -> DataFrame:
    """Directed BFS distance from the nearest seed host — the crawl-depth
    audit: every production crawl caps how many link hops from the seed
    list it will wander (depth policies in Heritrix / the hops field in
    Common Crawl metadata), and frontier rows beyond the cap are pruned
    before they are fetched. The distance also stratifies quality
    reporting (content quality degrades with hop count — a standard
    corpus-QA cut).

    Output: one row per host — (host, is_seed, hops, reached). ``hops``
    is the exact shortest directed distance capped at ``max_hops``;
    hosts not reachable within the cap carry NULL hops and
    reached=false (degrade-don't-drop).

    Loop shape: iterative min-distance propagation in the pair-relation
    discipline — static src-partitioned edges pinned once, each of the
    ``max_hops`` rounds shuffles only the (host, dist) INT pair
    relation (union with the hop messages + one min groupBy), itself
    pinned at definition (two consumers: the message join and the
    union). The DuckDB oracle runs a bounded recursive CTE instead — a
    different algorithm, so the conformance test checks answers, not a
    mirrored plan. Fixed iteration count keeps the result a pure lazy
    DataFrame (the queries() contract); a convergence-checked driver
    loop would localCheckpoint + count per round like components().
    """
    from don_crawler_spark.plans.adaptive import adaptive_partitions

    # size-derived loop-relation width (guide §2.2; see pagerank)
    npart = adaptive_partitions(edges)
    e = (
        edges.select("src", "dst")
        .repartition(npart, "src")
        .localCheckpoint(eager=False)
    )
    # derive nodes from the pinned edge relation (not the raw plan, which
    # would recompute the scan + distinct a second time)
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionAll(e.select(F.col("dst").alias("host")))
        .distinct()
        .coalesce(npart)
        .localCheckpoint(eager=False)
    )
    seed_set = seeds.select(F.col("host")).distinct().join(
        nodes, "host", "left_semi"
    )
    state = seed_set.select("host", F.lit(0).cast("int").alias("dist"))
    for _ in range(max_hops):
        state = state.coalesce(npart).localCheckpoint(eager=False)
        msgs = (
            e.join(state, e["src"] == state["host"])
            .select(F.col("dst").alias("host"), (F.col("dist") + 1).alias("dist"))
        )
        state = (
            state.unionByName(msgs)
            .groupBy("host")
            .agg(F.min("dist").cast("int").alias("dist"))
        )
    reached = nodes.join(
        state.select(F.col("host").alias("s_host"), "dist"),
        nodes["host"] == F.col("s_host"),
        "left",
    )
    return reached.select(
        F.col("host").cast("int").alias("host"),
        (F.col("dist") == 0).alias("is_seed"),
        F.when(F.col("dist") <= max_hops, F.col("dist")).alias("hops"),
        F.col("dist").isNotNull().alias("reached"),
    ).select(
        "host",
        F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
        "hops",
        "reached",
    )


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the undirected host graph (Newman 2002):
    the Pearson correlation of endpoint degrees over edges — do hubs
    link to hubs (assortative, r > 0) or to the periphery
    (disassortative, r < 0)? Web host graphs are mildly disassortative;
    a strongly negative r with high clustering is the link-farm
    signature (one pharmacy hub fanning out to thousands of one-link
    satellites), so this single number is the cheapest whole-graph
    screen before the per-host verdicts (reciprocity_score,
    triangles).

    Exactness: every moment (m, Sx, Sxy, Sxx) is an exact integer sum
    over the SYMMETRIC edge list (each undirected edge contributes both
    (du, dv) and (dv, du), so the x/y marginals coincide and one pass
    suffices), accumulated in DECIMAL(38,0) — int64 overflows at
    ~10^9.5 edge-degree products, real web-graph territory. The
    correlation numerator/denominator are emitted as exact decimal
    strings next to the rounded double, so the DuckDB oracle (HUGEINT
    arithmetic) compares bit-for-bit.

    Plan: one degree aggregate, two broadcast-sized joins to attach
    endpoint degrees, ONE single-row aggregate — the edge relation is
    scanned once and nothing but the 1-row moment vector leaves the
    partial aggregation.
    """
    from don_crawler_spark.plans.adaptive import adaptive_partitions

    # size-derived relation width (guide §2.2; see pagerank)
    npart = adaptive_partitions(edges)
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .coalesce(npart)
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("host"))
        .unionAll(und.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("host").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("host").alias("v"), F.col("d").alias("dv"))
    pairs = und.join(du, "u").join(dv, "v")
    # symmetric moments: x over (du, dv) AND (dv, du) in one pass
    dec = "decimal(38,0)"
    agg = pairs.agg(
        (F.count(F.lit(1)) * 2).cast("long").alias("m_edges"),
        # per-row products computed IN decimal (r5 ADVICE): casting only
        # the accumulation left the BIGINT du*dv product to overflow at
        # degrees near 2^31; identical values wherever the old form
        # didn't overflow, so the oracle comparison is unchanged
        F.sum((F.col("du") + F.col("dv")).cast(dec)).alias("sum_x"),
        F.sum(F.col("du").cast(dec) * F.col("dv").cast(dec) * 2).alias(
            "sum_xy"
        ),
        F.sum(
            F.col("du").cast(dec) * F.col("du").cast(dec)
            + F.col("dv").cast(dec) * F.col("dv").cast(dec)
        ).alias("sum_xx"),
    )
    num = F.col("m_edges").cast(dec) * F.col("sum_xy") - F.col("sum_x") * F.col(
        "sum_x"
    )
    den = F.col("m_edges").cast(dec) * F.col("sum_xx") - F.col("sum_x") * F.col(
        "sum_x"
    )
    return agg.select(
        "m_edges",
        F.col("sum_x").cast("string").alias("sum_x"),
        F.col("sum_xy").cast("string").alias("sum_xy"),
        F.col("sum_xx").cast("string").alias("sum_xx"),
        F.when(
            den != F.lit(0).cast(dec),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("assortativity"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Per-host triangle counts + local clustering coefficient over the
    undirected host graph — the density signal behind link-farm
    detection (farm members interlink, so their neighborhoods close
    into triangles far more often than editorially-linked hosts; the
    complement of reciprocity_score's edge-level view) and the standard
    graph-QA statistic next to degree_distribution.

    Algorithm: **degree-ordered orientation** (the MapReduce-era
    standard for web-scale exact triangle counting — Suri & Vassilvitskii,
    WWW 2011): orient every undirected edge from its lower-(degree, id)
    endpoint to the higher one, enumerate wedges only at each edge's
    LOW endpoint, and close them with a semi-join against the edge set.
    The orientation bounds per-vertex out-degree by O(sqrt(|E|)), so a
    degree-10^6 hub contributes wedges only through its low-degree
    neighbors — the wedge relation stays near-linear in |E| instead of
    exploding quadratically at hubs, and no shuffle key is hub-skewed.
    The DuckDB oracle deliberately uses the OTHER algorithm (the naive
    three-way join, fine at oracle scale), so the test checks the
    result, not a mirrored plan.

    Output: (host, degree, n_triangles, clustering_permille) with the
    coefficient as exact integer permille of closed wedges:
    ``2000 * t // (deg * (deg - 1))``, 0 where degree < 2.
    """
    from don_crawler_spark.plans.adaptive import adaptive_partitions

    # size-derived relation width (guide §2.2; see pagerank)
    npart = adaptive_partitions(edges)
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .coalesce(npart)
        # consumed three times (degree count, orientation, closing
        # semi-join): pin to one computation
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("host"))
        .unionAll(und.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("degree"))
        .coalesce(npart)
        .localCheckpoint(eager=False)
    )
    du = deg.select(F.col("host").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("host").alias("v"), F.col("degree").alias("dv"))
    low_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        # the wedge self-join reads this relation twice
        .coalesce(npart)
        .localCheckpoint(eager=False)
    )
    x, y = o.alias("x"), o.alias("y")
    wedges = (
        x.join(y, F.col("x.a") == F.col("y.a"))
        .filter(F.col("x.b") < F.col("y.b"))
        .select(
            F.col("x.a").alias("t1"),
            F.col("x.b").alias("t2"),
            F.col("y.b").alias("t3"),
        )
    )
    # wedge (t2, t3) already normalized (t2 < t3): triangle iff that
    # edge exists — left-semi so the wedge relation never widens
    tri = wedges.join(
        und,
        (wedges["t2"] == und["u"]) & (wedges["t3"] == und["v"]),
        "left_semi",
    )
    th = (
        tri.select(F.explode(F.array("t1", "t2", "t3")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return deg.join(th, "host", "left").select(
        F.col("host").cast("int").alias("host"),
        F.col("degree").cast("int").alias("degree"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_triangles"),
        F.expr(
            "CASE WHEN degree >= 2"
            " THEN coalesce(n, 0) * 2000 DIV (degree * (degree - 1))"
            " ELSE 0 END"
        )
        .cast("long")
        .alias("clustering_permille"),
    )


def anchor_text_topk(
    links: DataFrame, k: int = 3, min_inlinks: int = 1
) -> DataFrame:
    """Inbound anchor-text aggregation — the classic web-corpus signal
    (search engines and crawl-quality pipelines rank a page by what
    OTHER pages' links call it; anchor text is famously a better
    document descriptor than the document's own words).

    Input: one row per link ``(src, dst, anchor)``. Output: per target,
    total inlink count, distinct anchor count, and the top-``k`` anchor
    strings by frequency — flattened to one row per (dst, rank) so the
    result stays array-free (exact cross-engine comparison).

    Engine shape: ONE logical groupBy (dst, anchor) with map-side
    partial aggregation (the shuffle carries (dst, anchor, count), one
    row per distinct pair per partition, never the raw link list), then
    a window over dst. The window partition is the number of DISTINCT
    anchors per target — bounded in practice (anchor vocabulary per
    page is small) even where raw inlink count is power-law skewed;
    the skewed dimension is collapsed by the partial agg BEFORE any
    per-dst work, which is what makes this shape safe at web scale.
    Determinism: ties break (count DESC, anchor ASC) — no task-order
    dependence.
    """
    from pyspark.sql import Window

    per_anchor = links.groupBy("dst", "anchor").agg(
        F.count("*").alias("cnt")
    )
    w_dst = Window.partitionBy("dst")
    ranked = per_anchor.select(
        "dst",
        "anchor",
        "cnt",
        F.sum("cnt").over(w_dst).alias("n_inlinks"),
        F.count("*").over(w_dst).cast("long").alias("n_anchors"),
        F.row_number()
        .over(w_dst.orderBy(F.col("cnt").desc(), F.col("anchor")))
        .alias("rank"),
    )
    return ranked.where(
        (F.col("rank") <= k) & (F.col("n_inlinks") >= min_inlinks)
    ).select("dst", "n_inlinks", "n_anchors", "rank", "anchor", "cnt")


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) in integer
    fixed-point: auth(v) = sum of in-neighbour hub scores, hub(u) = sum
    of out-neighbour auth scores, each half-step renormalized so the top
    score sits at ~NANO. Normalization is by the MAX (L-inf — standard
    in HITS expositions) and runs DIV-first: ``x DIV greatest(m DIV
    NANO, 1)`` keeps every intermediate within int64 (a direct
    ``x * NANO DIV m`` would overflow at ~1e13 raw mass), and both
    engines replay the identical truncating arithmetic, so the oracle is
    bit-exact — the pagerank convention.

    Scale shape: the static edge relation is hash-partitioned ONCE in
    each join direction (by src for the auth step, by dst for the hub
    step) and persisted; every iteration shuffles only the (host, score)
    BIGINT pair relation into those layouts — edges outnumber nodes
    10-100x on web graphs, so edges never move. The max is a 1-row
    aggregate crossJoin-broadcast back, map-side. Fixed iterations
    unroll into one lazy Catalyst plan (the queries() contract).

    Output: (host, out_deg, in_deg, auth_nano, hub_nano, authority,
    hub) with the doubles rounded to 6dp.
    """
    from don_crawler_spark.plans.adaptive import adaptive_partitions

    # size-derived loop-relation width (guide §2.2; see pagerank)
    npart = adaptive_partitions(edges)
    # ONE persisted copy of the edge relation; every other static
    # relation (the dst layout, nodes, the degree aggregates below)
    # derives from it — the un-persisted edge plan (scan + union +
    # distinct) used to be recomputed five times (e_src, e_dst, nodes,
    # outd, ind), a full exchange each
    e_src = edges.repartition(npart, "src").persist()
    e_dst = e_src.repartition(npart, "dst").persist()
    nodes = (
        e_src.select(F.col("src").alias("host"))
        .unionAll(e_src.select(F.col("dst").alias("host")))
        .distinct()
        .coalesce(npart)
        # referenced in every iteration's two outer joins + the final
        # projection: pin to one computation (lazy, see loop note)
        .localCheckpoint(eager=False)
    )
    norm = "DIV greatest(coalesce(m, 0) DIV {n}, 1)".format(n=NANO)
    # SPARSE iteration state (r6 restructure): the loop used to rebuild a
    # DENSE per-node score each half-step (nodes LEFT JOIN raw, missing ->
    # 0). Hosts absent from a raw half-step relation score exactly 0
    # (coalesce(null, 0) DIV norm = 0) and a 0 score contributes 0 to
    # every downstream sum and never wins the max, so the dense rebuild
    # join changes NO value — but it cost two extra joins per half-step,
    # and (because a checkpoint joined against a checkpoint derived from
    # it loses its recorded partitioning to relation-dedup) each planned
    # as a sort-merge join with two full-width exchanges. The loop now
    # carries only the sparse (host, score) pairs; zeros are filled once
    # in the final projection. Values are bit-identical.
    hub = nodes.select("host", F.lit(NANO).cast("long").alias("h"))
    auth = None
    for _ in range(iters):
        # each raw half-step relation is referenced TWICE (its max
        # aggregate + the score join), so the unrolled lazy plan would
        # re-derive the subtree compounding per iteration. A LAZY
        # localCheckpoint AT DEFINITION (first materialization caches;
        # queries() stays lazy) pins it to one computation — pinning
        # after the consumers were built leaves them on the raw plan.
        # Measured 14.7s -> ~5.9s at sf0.1, values bit-identical.
        araw = (
            e_src.join(hub, e_src["src"] == hub["host"])
            .groupBy("dst")
            .agg(F.sum("h").alias("ar"))
            .coalesce(npart)
            .localCheckpoint(eager=False)
        )
        amax = araw.agg(F.max("ar").alias("m"))
        auth = (
            araw.crossJoin(F.broadcast(amax))
            .select(F.col("dst").alias("host"), F.expr(f"ar {norm}").alias("a"))
        )
        hraw = (
            e_dst.join(auth, e_dst["dst"] == auth["host"])
            .groupBy("src")
            .agg(F.sum("a").alias("hr"))
            .coalesce(npart)
            .localCheckpoint(eager=False)
        )
        hmax = hraw.agg(F.max("hr").alias("m"))
        hub = (
            hraw.crossJoin(F.broadcast(hmax))
            .select(F.col("src").alias("host"), F.expr(f"hr {norm}").alias("h"))
        )
    # degree aggregates reuse the persisted layouts: e_src is already
    # hash-partitioned by src (e_dst by dst), so neither groupBy adds an
    # exchange
    outd = e_src.groupBy("src").agg(F.count("*").alias("od"))
    ind = e_dst.groupBy("dst").agg(F.count("*").alias("id_"))
    return (
        nodes.join(outd, nodes["host"] == outd["src"], "left")
        .join(ind, nodes["host"] == ind["dst"], "left")
        .join(
            auth.withColumnRenamed("host", "ah"),
            F.col("host") == F.col("ah"),
            "left",
        )
        .join(
            hub.withColumnRenamed("host", "hh"),
            F.col("host") == F.col("hh"),
            "left",
        )
        .select(
            F.col("host").cast("int").alias("host"),
            F.coalesce("od", F.lit(0)).cast("int").alias("out_deg"),
            F.coalesce("id_", F.lit(0)).cast("int").alias("in_deg"),
            # zero-fill for hosts absent from the sparse score relations
            # — identical to the dense loop's coalesce(raw, 0) DIV norm
            F.coalesce("a", F.lit(0)).alias("auth_nano"),
            F.coalesce("h", F.lit(0)).alias("hub_nano"),
            F.round(F.coalesce("a", F.lit(0)) / F.lit(float(NANO)), 6).alias(
                "authority"
            ),
            F.round(F.coalesce("h", F.lit(0)) / F.lit(float(NANO)), 6).alias(
                "hub"
            ),
        )
    )


def components(edges: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components of the (undirected) host link graph — the
    third classic link-graph analysis after PageRank/HITS, and the same
    primitive the dedup pipeline uses to collapse near-dup pair edges
    (operators/dedup.connected_components, reused verbatim here — one
    CC implementation, two callers). Web-graph use: isolating link
    farms / disconnected satellite sites and sizing the reachable core
    before a recrawl budget is split.

    Output: (host, component_id, n_members, is_rep) with component_id =
    min host id in the component — the unique order-independent fixed
    point, so the DuckDB recursive-CTE oracle converges to identical
    labels despite computing them by transitive closure instead of
    iterative min-label propagation.

    Plan shape: the propagation loop is O(diameter) rounds of one
    8-byte-key shuffle each over localCheckpoint-ed edges (lineage
    bounded); the member-count join broadcasts the small per-component
    aggregate back over the labels.
    """
    from don_crawler_spark.operators.dedup import connected_components

    lab = connected_components(
        edges, src="src", dst="dst", max_iters=max_iters
    ).select(
        F.col("doc_id").cast("long").alias("host"),
        F.col("cluster_id").cast("long").alias("component_id"),
        F.col("keep").alias("is_rep"),
    )
    sizes = lab.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return lab.join(F.broadcast(sizes), "component_id").select(
        "host", "component_id", "n_members", "is_rep"
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Log2-bucketed in/out-degree histogram of the host graph — the
    power-law audit every web-graph pipeline runs before sizing
    anything downstream (a heavy tail in the in-degree histogram means
    hub hosts that will skew any dst-keyed shuffle; the crawl's salted
    windows and the anchor-text partial aggs exist because of exactly
    this shape).

    Output: (direction, bucket, degree_min, n_hosts) where bucket =
    floor(log2(degree)) computed EXACTLY as length(bin(degree)) - 1 —
    integer string arithmetic, no float log ULP hazard, identical in
    DuckDB — and degree_min = 2^bucket labels the bucket's lower edge.

    Plan: two (src/dst) partial-agg degree counts + two tiny histogram
    aggregates over the per-host frames, unioned. Every shuffle
    carries an 8-byte key and a count.
    """
    def hist(col: str, direction: str) -> DataFrame:
        deg = edges.groupBy(F.col(col).alias("host")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        bucket = (F.length(F.bin("degree")) - 1).cast("int")
        return (
            deg.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_hosts"))
            .select(
                F.lit(direction).alias("direction"),
                "bucket",
                F.expr("shiftleft(CAST(1 AS BIGINT), bucket)")
                .cast("bigint")
                .alias("degree_min"),
                "n_hosts",
            )
        )

    return hist("src", "out").unionByName(hist("dst", "in"))


def reciprocity_score(edges: DataFrame) -> DataFrame:
    """Per-host link-reciprocity — the classic nepotistic-linking spam
    signal (link farms exchange links, so a farm member's out-edges are
    overwhelmingly reciprocated; editorial links mostly are not —
    Fetterly/Gyongyi-era web-spam heuristics). Feeds the same verdict
    surface as crawl_trap_report: a cheap structural prior on which
    hosts to distrust before any content is fetched.

    Output per host with out-degree > 0: out_deg, n_reciprocal (out-
    edges whose reverse edge exists), recip_permille (exact integer
    permille, the repo-wide threshold discipline), is_farm_suspect at
    >= 800 permille with out_deg >= 4 (both bars exact-integer).

    Plan: distinct edges self-join on the REVERSED pair — one hash
    shuffle keyed by the 16-byte (src, dst) pair, left-semi so matched
    edges never widen — then a per-src partial-agg count. No windows,
    no skew beyond the graph's own out-degree distribution (bounded by
    per-host politeness at crawl time).
    """
    # self-loops excluded: a src==dst edge is its own reverse and would
    # read as a reciprocated link (intra-host links are near-universal
    # on real host graphs, so unfiltered input would flag everything)
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nrec = recip.groupBy("src").agg(F.count(F.lit(1)).alias("n_reciprocal"))
    j = outd.join(nrec, "src", "left").select(
        F.col("src").alias("host"),
        "out_deg",
        F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"),
    )
    permille = F.expr("n_reciprocal * 1000 DIV out_deg")
    return j.select(
        "host",
        "out_deg",
        "n_reciprocal",
        permille.alias("recip_permille"),
        (
            (F.col("n_reciprocal") * 1000 >= F.col("out_deg") * 800)
            & (F.col("out_deg") >= 4)
        ).alias("is_farm_suspect"),
    )


def pagerank_personalized(
    edges: DataFrame, seeds: DataFrame, iters: int = 5
) -> DataFrame:
    """Topic-sensitive / personalized PageRank (Haveliwala, WWW 2002):
    the teleport vector is restricted to a SEED host set instead of
    uniform — rank mass measures proximity to the seeds, which is how
    a focused crawl scores frontier hosts against a topic whitelist
    and how seed-quality propagation (TrustRank-style) works.

    Same integer fixed-point discipline as pagerank: mass starts
    uniform over the seeds, teleport pays ``15*NANO DIV (100*|S|)`` to
    seed hosts only, dangling mass redistributes to the seeds
    (``dsum DIV |S|`` inside the damped term), every step exact BIGINT
    floor arithmetic — the DuckDB unrolled-CTE oracle matches
    bit-for-bit. Non-seed hosts unreachable from the seeds correctly
    read rank 0.

    Plan shape now mirrors hits() (VERDICT r4 #3: this loop used to
    carry the static ``(deg, is_seed, s)`` columns through every rank
    exchange and re-derive each iteration's rank subtree twice — its
    two consumers, the share join and the dangling sum, each rebuilt
    it): the static relations — edges-with-out-degree partitioned by
    src, the node state, the dangling host set — are built ONCE and
    lazily localCheckpoint-ed; each iteration shuffles only the
    (host, r) BIGINT pair relation, itself pinned at definition
    because it has two consumers. ``seeds``: a (host) DataFrame,
    joined broadcast onto the static node state — the broadcast is
    the reason this loop is NOT merged with pagerank() despite the
    recurrence being its seeds=all-nodes generalization: uniform
    pagerank must not materialize/broadcast the full node set as a
    seed list, so the two keep separate loops (and separate unrolled
    oracles) on purpose.
    """
    from don_crawler_spark.plans.adaptive import adaptive_partitions

    # size-derived loop-relation width (guide §2.2; see pagerank)
    npart = adaptive_partitions(edges)
    edges = edges.repartition(npart, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionAll(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # static (src, dst, deg) message relation: deg is computed FROM the
    # src-partitioned edges, so this join reuses the layout — and every
    # iteration's share join against it moves only the rank pairs
    e_deg = edges.join(deg, "src").localCheckpoint(eager=False)
    seed_flag = seeds.select(F.col("host").alias("s_host")).distinct()
    flagged = (
        nodes.join(deg, nodes["host"] == deg["src"], "left")
        .join(F.broadcast(seed_flag), nodes["host"] == F.col("s_host"), "left")
        .select(
            "host",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.col("s_host").isNotNull().alias("is_seed"),
        )
    )
    # |S| counts seeds PRESENT IN THE GRAPH (seeds ∩ nodes) — a
    # whitelisted host that is not in the edge set yet must not dilute
    # the teleport mass (and the oracle counts the same set). s = 0
    # (no seed reachable at all) degrades to all-zero ranks via the
    # guarded CASE, never a division by zero.
    sn = flagged.filter("is_seed").agg(F.count("*").alias("s"))
    # static node state, referenced by every iteration's rebuild join,
    # the dangling set, and the final projection: pin to one computation
    nd = (
        flagged.crossJoin(F.broadcast(sn))
        .coalesce(npart)
        .localCheckpoint(eager=False)
    )
    dang_hosts = nd.filter(F.col("deg") == 0).select("host")
    ranks = nd.select(
        "host",
        F.expr(
            f"CASE WHEN is_seed AND s > 0 THEN {NANO} DIV s ELSE 0 END"
        ).alias("r"),
    )
    for _ in range(iters):
        # two consumers per iteration (share join + dangling sum): a
        # lazy localCheckpoint AT DEFINITION pins the pair relation to
        # one computation instead of compounding re-derivation in the
        # unrolled plan (the hits() fix, measured 14.7s -> 5.9s there)
        ranks = ranks.coalesce(npart).localCheckpoint(eager=False)
        shares = (
            e_deg.join(ranks, e_deg["src"] == ranks["host"])
            .select(F.col("dst"), F.expr("r DIV deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("m"))
        )
        dang = (
            ranks.join(dang_hosts, "host", "left_semi")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dsum"))
        )
        ranks = (
            nd.join(shares, nd["host"] == shares["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                F.expr(
                    f"CASE WHEN is_seed AND s > 0"
                    f" THEN {15 * NANO}L DIV (100 * s) ELSE 0 END"
                    " + (85 * (coalesce(m, 0)"
                    "          + CASE WHEN is_seed AND s > 0"
                    "            THEN dsum DIV s ELSE 0 END))"
                    " DIV 100"
                ).alias("r"),
            )
        )
    meta = nd.select(F.col("host").alias("m_host"), "is_seed")
    return ranks.join(meta, ranks["host"] == meta["m_host"]).select(
        F.col("host").cast("int").alias("host"),
        "is_seed",
        F.col("r").alias("ppr_nano"),
        F.round(F.col("r") / F.lit(float(NANO)), 6).alias("ppr"),
    )
