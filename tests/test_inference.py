"""Formula-level checks for the statistical-inference tier.

The oracle-parity sweep proves Spark == DuckDB; these tests prove the
FORMULAS by recomputing every statistic independently with numpy over
the same parquet inputs (pandas load, explicit textbook arithmetic).
A shared Spark/oracle mistake cannot pass here.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR

from cassandra_elasticsearch_sync_spark import registry

SPECS = registry.all_specs()


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _run(spark, name):
    return SPECS[name].fn(spark, SF_DIR).collect()


def test_welch_ttest_matches_numpy(spark):
    e = _events()
    a = e.loc[(e.event_type == "purchase") & e.value.notna(), "value"].to_numpy()
    b = e.loc[(e.event_type == "error") & e.value.notna(), "value"].to_numpy()
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / len(a) + v2 / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2 ** 2 / ((v1 / len(a)) ** 2 / (len(a) - 1)
                      + (v2 / len(b)) ** 2 / (len(b) - 1))
    (row,) = _run(spark, "k_welch_ttest")
    assert (row.n1, row.n2) == (len(a), len(b))
    assert row.t_stat == pytest.approx(t, abs=2e-6)
    assert row.welch_dof == pytest.approx(dof, abs=2e-6)


def test_mann_whitney_matches_numpy(spark):
    e = _events()
    sel = e[e.event_type.isin(["purchase", "error"]) & e.value.notna()]
    x = sel[sel.event_type == "purchase"].value.to_numpy()
    y = sel[sel.event_type == "error"].value.to_numpy()
    combined = np.concatenate([x, y])
    # average ranks with ties (1-based)
    order = combined.argsort(kind="mergesort")
    ranks = np.empty(len(combined))
    sorted_v = combined[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1  # average of 1-based ranks
        i = j + 1
    n1, n2 = len(x), len(y)
    r1 = ranks[:n1].sum()
    u = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    _, tie_counts = np.unique(combined, return_counts=True)
    tie_term = float((tie_counts ** 3 - tie_counts).sum())
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - tie_term / (n * (n - 1))))
    z = (u - n1 * n2 / 2) / sigma
    (row,) = _run(spark, "k_mann_whitney_u")
    assert (row.n1, row.n2) == (n1, n2)
    assert row.u_stat == pytest.approx(u, abs=2e-6)
    assert row.z_stat == pytest.approx(z, abs=2e-6)


def test_two_proportion_ztest_matches_numpy(spark):
    e = _events()
    conv = (e.assign(hit=((e.event_type == "purchase") & (e.value > 480))
                     .astype(int))
            .groupby("user_id").hit.max())
    cohort = conv.index.to_series() % 2
    n1, k1 = int((cohort == 0).sum()), int(conv[cohort == 0].sum())
    n2, k2 = int((cohort == 1).sum()), int(conv[cohort == 1].sum())
    (row,) = _run(spark, "k_two_proportion_ztest")
    assert (row.n1, row.k1, row.n2, row.k2) == (n1, k1, n2, k2)
    if 0 < k1 + k2 < n1 + n2:
        pp = (k1 + k2) / (n1 + n2)
        z = (k1 / n1 - k2 / n2) / math.sqrt(
            pp * (1 - pp) * (1 / n1 + 1 / n2))
        assert row.z_stat == pytest.approx(z, abs=2e-6)
    else:
        assert row.z_stat is None


def test_benford_shares_sum_to_one_and_digits_exact(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    digits = np.array([int(str(c)[0]) for c in cents[cents > 0]])
    expected = pd.Series(digits).value_counts().sort_index()
    rows = _run(spark, "k_benford_first_digit")
    got = {r.digit: r.n for r in rows}
    assert got == expected.to_dict()
    assert sum(r.obs_share for r in rows) == pytest.approx(1.0, abs=1e-5)
    # Benford reference shares are a fixed law, independent of data
    for r in rows:
        assert r.benford_share == pytest.approx(
            math.log10(1 + 1 / r.digit), abs=1e-6)


def test_mutual_information_matches_numpy(spark):
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ct = pd.crosstab(d.lang, d.source).to_numpy().astype(float)
    n = ct.sum()
    pxy = ct / n
    px = pxy.sum(axis=1, keepdims=True)
    py = pxy.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(pxy > 0, pxy * np.log(pxy / (px * py)), 0.0)
    mi = terms.sum()
    hx = -(px * np.log(px)).sum()
    (row,) = _run(spark, "k_mutual_information")
    assert row.mutual_information_nats == pytest.approx(mi, abs=2e-6)
    assert row.uncertainty_coefficient == pytest.approx(mi / hx, abs=2e-6)


def test_zipf_fit_matches_numpy(spark):
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    tokens = pd.Series(
        w for t in d.text for w in str(t).lower().split(" ") if True)
    tf = tokens.value_counts()
    # rank by (tf desc, token asc), exactly the query's total order
    df = tf.reset_index()
    df.columns = ["token", "tf"]
    df = df.sort_values(["tf", "token"], ascending=[False, True])
    df = df.head(1000)
    x = np.round(np.log(np.arange(1, len(df) + 1, dtype=float)), 6)
    y = np.round(np.log(df.tf.to_numpy(dtype=float)), 6)
    slope = ((x * y).sum() - x.sum() * y.sum() / len(x)) / (
        (x * x).sum() - x.sum() ** 2 / len(x))
    intercept = y.mean() - slope * x.mean()
    (row,) = _run(spark, "k_zipf_fit")
    assert row.n == len(df)
    assert row.zipf_slope == pytest.approx(slope, abs=2e-6)
    assert row.log_intercept == pytest.approx(intercept, abs=2e-6)


def test_skyline_no_dominated_row_survives(spark):
    p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    rows = _run(spark, "c13_skyline_per_group")
    best = (p.groupby(["p_brand", "p_size"]).p_retailprice.min()
            .reset_index())
    # independence check: every returned point is non-dominated, and
    # every non-dominated point is returned
    want = set()
    for brand, grp in best.groupby("p_brand"):
        pts = grp[["p_size", "p_retailprice"]].to_numpy()
        for s, pr in pts:
            dominated = any(
                (s2 > s and pr2 <= pr) for s2, pr2 in pts)
            if not dominated:
                want.add((brand, int(s), float(pr)))
    got = {(r.p_brand, r.p_size, r.price) for r in rows}
    assert got == want


def test_market_basket_lift_hand_check(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pt = pd.read_parquet(f"{SF_DIR}/part.parquet")
    ob = (li.merge(pt, left_on="l_partkey", right_on="p_partkey")
          [["l_orderkey", "p_brand"]].drop_duplicates())
    n_orders = ob.l_orderkey.nunique()
    brand_ct = ob.p_brand.value_counts()
    pair_ct: dict[tuple[str, str], int] = {}
    for _, grp in ob.groupby("l_orderkey"):
        brands = sorted(grp.p_brand)
        for i in range(len(brands)):
            for j in range(i + 1, len(brands)):
                pair_ct[(brands[i], brands[j])] = \
                    pair_ct.get((brands[i], brands[j]), 0) + 1
    rows = _run(spark, "c14_market_basket_lift")
    assert len(rows) == 20
    for r in rows:
        c = pair_ct[(r.brand_a, r.brand_b)]
        assert r.pair_ct == c
        lift = (c / n_orders) / ((brand_ct[r.brand_a] / n_orders)
                                 * (brand_ct[r.brand_b] / n_orders))
        assert r.lift == pytest.approx(lift, abs=2e-6)
    # rows are the true top-20 by lift
    all_lifts = sorted(
        ((c / n_orders) / ((brand_ct[a] / n_orders) * (brand_ct[b] / n_orders))
         for (a, b), c in pair_ct.items()),
        reverse=True)
    assert min(r.lift for r in rows) == pytest.approx(
        round(all_lifts[19], 6), abs=2e-6)


def test_stratified_sample_rates_and_determinism(spark):
    rows1 = _run(spark, "k_stratified_sample")
    rows2 = _run(spark, "k_stratified_sample")
    assert sorted(r.doc_id for r in rows1) == sorted(r.doc_id for r in rows2)
    for r in rows1:
        want = 10 if r.lang == "en" else (25 if r.lang in ("zh", "es") else 50)
        assert r.stratum_pct == want
        assert r.bucket < want


def test_mann_whitney_random_frames_property(spark):
    """Property check on RANDOM synthetic two-sample frames (heavy
    ties, tiny domains) - the tie-corrected U/z must match the
    textbook computation for every draw."""
    import numpy as np

    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_global_order,
    )

    rng = np.random.RandomState(7)
    for trial in range(4):
        n1, n2 = rng.randint(30, 120), rng.randint(30, 120)
        # small integer domain -> many ties, the hard case
        x = rng.randint(0, 12, n1).astype(float)
        y = rng.randint(0, 12, n2).astype(float)
        rows = [(float(v), "a") for v in x] + [(float(v), "b") for v in y]
        df = spark.createDataFrame(rows, "value double, grp string")

        vals = (df.groupBy(F.col("value").alias("v"))
                .agg(F.count("*").alias("c"),
                     F.sum(F.when(F.col("grp") == "a", 1).otherwise(0))
                     .alias("c1")))
        cum, _ = with_global_order(vals, [F.col("v")], cumsum_of="c",
                                   cumsum_col="cumc")
        r1_term = (F.col("c1")
                   * ((F.col("cumc") - F.col("c")).cast("double")
                      + (F.col("c") + 1) / 2.0))
        got = cum.agg(F.sum("c1").alias("n1"),
                      F.sum(F.col("c") - F.col("c1")).alias("n2"),
                      F.sum(r1_term).alias("r1"),
                      F.sum(F.col("c") ** 3 - F.col("c")).alias("tie")
                      ).collect()[0]

        combined = np.concatenate([x, y])
        order = combined.argsort(kind="mergesort")
        ranks = np.empty(len(combined))
        sv = combined[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        assert got.n1 == n1 and got.n2 == n2
        assert got.r1 == pytest.approx(ranks[:n1].sum(), abs=1e-6)
        _, tc = np.unique(combined, return_counts=True)
        assert got.tie == int((tc ** 3 - tc).sum())


def test_skyline_random_frames_property(spark):
    """Random (brand, size, price) frames: the window-based skyline
    must equal brute-force dominance filtering for every draw."""
    import numpy as np

    from pyspark.sql import functions as F, Window

    rng = np.random.RandomState(23)
    for trial in range(3):
        n = rng.randint(40, 120)
        rows = [(f"B{int(b)}", int(s), float(p))
                for b, s, p in zip(rng.randint(0, 4, n),
                                   rng.randint(1, 9, n),
                                   rng.randint(1, 30, n))]
        df = spark.createDataFrame(rows, "brand string, size int, price double")
        best = (df.groupBy("brand", "size")
                .agg(F.min("price").alias("price")))
        w = (Window.partitionBy("brand").orderBy(F.col("size").desc())
             .rowsBetween(Window.unboundedPreceding, -1))
        got = {(r.brand, r.size, r.price)
               for r in best.withColumn("sm", F.min("price").over(w))
               .filter(F.col("sm").isNull() | (F.col("sm") > F.col("price")))
               .select("brand", "size", "price").collect()}

        # brute force over the grouped-min cells
        cells = {}
        for b, s, p in rows:
            cells[(b, s)] = min(cells.get((b, s), float("inf")), p)
        want = set()
        for (b, s), p in cells.items():
            dominated = any(b2 == b and s2 > s and p2 <= p
                            for (b2, s2), p2 in cells.items())
            if not dominated:
                want.add((b, s, p))
        assert got == want, f"trial {trial}"


def test_kruskal_wallis_matches_numpy(spark):
    e = _events()
    arms = ["purchase", "error", "click"]
    sel = e[e.event_type.isin(arms) & e.value.notna()]
    groups = [sel[sel.event_type == a].value.to_numpy() for a in arms]
    combined = np.concatenate(groups)
    order = combined.argsort(kind="mergesort")
    ranks = np.empty(len(combined))
    sorted_v = combined[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    n = len(combined)
    sizes = [len(g) for g in groups]
    bounds = np.cumsum([0] + sizes)
    h = 12 / (n * (n + 1)) * sum(
        ranks[bounds[k]:bounds[k + 1]].sum() ** 2 / sizes[k]
        for k in range(3)) - 3 * (n + 1)
    _, tie_counts = np.unique(combined, return_counts=True)
    corr = 1 - float((tie_counts ** 3 - tie_counts).sum()) / (n ** 3 - n)
    (row,) = _run(spark, "k_kruskal_wallis")
    assert (row.n1, row.n2, row.n3) == tuple(sizes)
    assert row.h_stat == pytest.approx(h, abs=2e-6)
    assert row.h_tied == pytest.approx(h / corr, abs=2e-6)


def test_theil_sen_matches_numpy(spark):
    e = _events()
    e = e.assign(day=e.ts.dt.floor("D"),
                 cents=(e.value * 100).round().astype("int64"))
    rows = _run(spark, "k7w_theil_sen_slope")
    assert rows, "no event types?"
    for row in rows:
        g = (e[e.event_type == row.event_type]
             .groupby("day", as_index=False).cents.sum())
        x = (g.day - pd.Timestamp("1995-01-01")).dt.days.to_numpy()
        y = g.cents.to_numpy(dtype=float)
        slopes = [(y[j] - y[i]) / (x[j] - x[i])
                  for i in range(len(x)) for j in range(i + 1, len(x))]
        assert row.n_pairs == len(slopes)
        assert row.theil_sen_slope == pytest.approx(
            float(np.median(slopes)), abs=2e-6)


def test_semdedup_prune_semantics(spark):
    """SemDeDup apply-step invariants on the real corpus: (1) the
    pruned set contains NO pair above the threshold (within the same
    blocking label) unless both survived as... it must contain none -
    every surviving same-label pair is below tau; (2) exactly one
    exemplar per dup component survives; (3) singletons all survive."""
    import numpy as np

    from cassandra_elasticsearch_sync_spark.pipeline.similarity import (
        DUP_COS_THRESHOLD,
    )

    SPECS2 = registry.all_specs()
    survivors = {r.vec_id for r in
                 SPECS2["k_semdedup_prune"].fn(spark, SF_DIR).collect()}
    pairs = [(r.vec_a, r.vec_b) for r in
             SPECS2["k_embedding_dup_pairs"].fn(spark, SF_DIR).collect()]
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    all_ids = set(emb.vec_id)
    dup_nodes = {v for p in pairs for v in p}
    # (3) singletons all survive
    assert (all_ids - dup_nodes) <= survivors
    # (1) no surviving near-dup pair
    assert not [(a, b) for a, b in pairs
                if a in survivors and b in survivors]
    # (2) one exemplar per component: union-find over pairs
    parent = {v: v for v in dup_nodes}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in pairs:
        parent[find(a)] = find(b)
    comps = {}
    for v in dup_nodes:
        comps.setdefault(find(v), set()).add(v)
    for root, members in comps.items():
        assert len(members & survivors) == 1, (root, members & survivors)
