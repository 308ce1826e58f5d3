"""Relational graph source: round-trip, partition filters, CLI parity.

The reference's Postgres ingest (salt/src/messages.py:32-291) had zero
test coverage (it only ever ran against live DeepDive clusters); here the
same loader logic runs against in-memory sqlite via DB-API 2.0.
"""

import sqlite3

import numpy as np
import pytest

from numbskull_tpu import dbsource
from numbskull_tpu import types as T
from numbskull_tpu.models import coin_exact_marginal, coin_model
from numbskull_tpu.numbskull import NumbSkull


def _publish(args, var_keys=None, factor_keys=None, app="coin"):
    w, v, f, fm, dm, e = args
    conn = sqlite3.connect(":memory:")
    cur = conn.cursor()
    dbsource.write_graph_to_db(cur, app, w, v, f, fm,
                               var_keys=var_keys, factor_keys=factor_keys)
    conn.commit()
    return conn, (w, v, f, fm)


def test_roundtrip_matches_arrays():
    args = coin_model(5, 0.3, -0.2, 0.4, evidence=True,
                      weight_init=(0.1, 0.2, 0.3), seed=1)
    conn, (w, v, f, fm) = _publish(args)
    cur = conn.cursor()
    weight, variable, factor, fmap, dmask, edges, meta = \
        dbsource.get_fg_data(cur)
    assert len(weight) == len(w)
    np.testing.assert_allclose(weight["initialValue"], w["initialValue"])
    assert (variable["isEvidence"] == v["isEvidence"]).all()
    assert (variable["cardinality"] == v["cardinality"]).all()
    assert edges == len(fm)
    # factor multiset matches: same (function, weight) histogram
    assert sorted(factor["factorFunction"]) == \
        sorted(f["factorFunction"])
    assert sorted(factor["weightId"]) == sorted(f["weightId"])
    # every factor's local vids resolve to the original global vids
    for i in range(len(factor)):
        gfid = int(meta["fid"][i])
        off, ar = int(factor[i]["ftv_offset"]), int(factor[i]["arity"])
        goff = int(f[gfid]["ftv_offset"])
        got = sorted(int(meta["vid"][fmap[off + j]["vid"]])
                     for j in range(ar))
        want = sorted(int(fm[goff + j]["vid"]) for j in range(ar))
        assert got == want


def test_view_name_factor_inference_longest_match():
    """AND_CAT table names must not resolve to AND."""
    v = T.new_variables(2)
    v["dataType"] = 1
    v["cardinality"] = 3
    w = T.new_weights(1)
    w["initialValue"] = 0.5
    f = T.new_factors(1)
    f["factorFunction"] = T.FACTORS["AND_CAT"]
    f["arity"] = 2
    f["ftv_offset"] = 0
    f["featureValue"] = 1.0
    fm = T.new_fmap(2)
    fm["vid"] = [0, 1]
    conn, _ = _publish((w, v, f, fm, None, 2), app="catapp")
    cur = conn.cursor()
    _, factor, _, _, _ = dbsource.get_factors(
        cur, dbsource.get_views(cur)[0])
    assert factor[0]["factorFunction"] == T.FACTORS["AND_CAT"]


def test_partition_filters_split_master_minion():
    """Master/minion ownership filters (reference numbskull_master.py:
    329-334, numbskull_minion.py:167-175): B vars go to both (owned by
    master), D{pid} vars to both (owned by minion pid), C{pid} to that
    minion only."""
    args = coin_model(4, evidence=True, seed=2)
    w, v, f, fm, dm, e = args
    # pair j: x1 key B (both sides, master-owned); x2 key D0 (both,
    # minion-owned) on even pairs, C0 (minion-only) on odd pairs. Factor
    # keys keep the reference invariant that a partition's factors only
    # reference variables its filter loads: odd pairs' x2-touching
    # factors are C0 (minion-only), their ISTRUE(x1) is B.
    var_keys = []
    for i in range(len(v)):
        if i % 2 == 0:
            var_keys.append("B")
        else:
            var_keys.append("D0" if (i // 2) % 2 == 0 else "C0")
    factor_keys = []
    for i in range(len(f)):
        pair = i // 3
        kind = i % 3          # 0: ISTRUE(x1), 1: ISTRUE(x2), 2: EQUAL
        if pair % 2 == 0:
            factor_keys.append("D0")
        else:
            factor_keys.append("B" if kind == 0 else "C0")
    conn, _ = _publish(args, var_keys=var_keys, factor_keys=factor_keys)

    cur = conn.cursor()
    mw, mv, mf, mfm, _, medges, mmeta = dbsource.get_fg_data(
        cur, dbsource.partition_filter("master"), is_master=True)
    # master sees B and D vars (not C)
    assert set(mmeta["var_pt"]) == {"B", "D"}
    # master does not own D vars
    d = mmeta["var_pt"] == "D"
    assert (mv["isEvidence"][d] == 4).all()
    assert (mv["isEvidence"][~d] != 4).all()

    cur = conn.cursor()
    nw, nv, nf, nfm, _, nedges, nmeta = dbsource.get_fg_data(
        cur, dbsource.partition_filter("minion", 0), is_master=False)
    assert set(nmeta["var_pt"]) == {"B", "C", "D"}
    b = nmeta["var_pt"] == "B"
    assert (nv["isEvidence"][b] == 4).all()   # minion doesn't own B
    assert (nv["isEvidence"][~b] != 4).all()

    # every variable is owned by exactly one side
    owned_master = set(mmeta["vid"][mv["isEvidence"] != 4])
    owned_minion = set(nmeta["vid"][nv["isEvidence"] != 4])
    assert owned_master.isdisjoint(owned_minion)
    assert owned_master | owned_minion == set(range(len(v)))


def test_db_to_bsp_distributed_pipeline():
    """The reference's full distributed pipeline, end to end: publish a
    graph to a database, derive a partition, run the bulk-synchronous
    partitioned engine, and recover exact marginals — what the reference
    could only do with a live salt+Postgres cluster."""
    import jax

    from numbskull_tpu.compile import conflict_edges
    from numbskull_tpu.parallel.bsp import BSPEngine
    from numbskull_tpu.parallel.partition import choose_partition

    args = coin_model(30, 0.3, -0.2, 0.4, evidence=False,
                      weight_init=(0.3, -0.2, 0.4), fixed=True)
    conn, _ = _publish(args)
    cur = conn.cursor()
    weight, variable, factor, fmap, dmask, edges, meta = \
        dbsource.get_fg_data(cur)

    part, report = choose_partition(
        len(variable), conflict_edges(variable, factor, fmap), 3)
    eng = BSPEngine(weight, variable, factor, fmap, part, mode="messages")
    states = eng.init_states()
    epochs = 3000
    states = eng.inference(states, jax.random.PRNGKey(0), epochs=epochs,
                           burn=100, sync_every=10)
    marg = eng.marginals(states, epochs)
    ex = coin_exact_marginal(0.3, -0.2, 0.4)
    # marginals pooled over the 30 copies (map local order via meta vid)
    x1 = marg[np.asarray(meta["vid"]) % 2 == 0, 1].mean()
    x2 = marg[np.asarray(meta["vid"]) % 2 == 1, 1].mean()
    assert x1 == pytest.approx(ex[2] + ex[3], abs=0.03)
    assert x2 == pytest.approx(ex[1] + ex[3], abs=0.03)


def test_cli_dburl_end_to_end(tmp_path):
    """-u sqlite:// URL drives the full pipeline; marginals match the
    exact coin joint."""
    args = coin_model(1, 0.3, -0.2, 0.4, evidence=False,
                      weight_init=(0.3, -0.2, 0.4), fixed=True)
    w, v, f, fm, dm, e = args
    db = str(tmp_path / "graph.db")
    conn = sqlite3.connect(db)
    dbsource.write_graph_to_db(conn.cursor(), "coin", w, v, f, fm)
    conn.commit()
    conn.close()

    ns = NumbSkull(n_inference_epoch=4000, burn_in=100, quiet=True,
                   dburl="sqlite://" + db, output_dir=str(tmp_path))
    ns.loadFGFromDB()
    ns.inference(out=False)
    marg = ns.factorGraphs[0].full_marginals(4000)
    ex = coin_exact_marginal(0.3, -0.2, 0.4)
    assert marg[0, 1] == pytest.approx(ex[2] + ex[3], abs=0.03)
    assert marg[1, 1] == pytest.approx(ex[1] + ex[3], abs=0.03)
