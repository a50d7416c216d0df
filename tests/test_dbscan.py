"""DBSCAN (stages/cluster.dbscan): distributed grid-bucketed
implementation vs a brute-force single-process reference."""

import numpy as np
import pyarrow as pa


def _brute(ids, px, py, eps, min_pts):
    n = len(ids)
    d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
    nb = d2 <= eps * eps
    core = nb.sum(1) >= min_pts          # includes self
    parent = {int(i): int(i) for i in ids[core]}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ci = np.where(core)[0]
    for a in ci:
        for b in ci:
            if nb[a, b] and a < b:
                ra, rb = find(int(ids[a])), find(int(ids[b]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    lab = {int(ids[a]): find(int(ids[a])) for a in ci}
    out = {}
    for k in range(n):
        i = int(ids[k])
        if core[k]:
            out[i] = (lab[i], 1)
        else:
            cand = [lab[int(ids[j])]
                    for j in np.where(nb[k] & core)[0] if j != k]
            out[i] = (min(cand) if cand else -1, 0)
    return out


def test_dbscan_matches_brute_force(ray_session):
    import ray.data as rd

    from gdal_ray.stages.cluster import dbscan

    rng = np.random.default_rng(42)
    n = 150
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 5 + 3)
    # three dense blobs + uniform noise
    px = np.concatenate([rng.normal(-30, 2, 40), rng.normal(25, 2, 40),
                         rng.normal(0, 2, 30), rng.uniform(-60, 60, 40)])
    py = np.concatenate([rng.normal(10, 2, 40), rng.normal(-20, 2, 40),
                         rng.normal(35, 2, 30), rng.uniform(-50, 50, 40)])
    eps, min_pts = 4.0, 5
    want = _brute(ids, px, py, eps, min_pts)
    t = pa.table({"point_id": pa.array(ids),
                  "px": pa.array(px), "py": pa.array(py)})
    got = dbscan(rd.from_arrow(t).repartition(6),
                 eps=eps, min_pts=min_pts).take_all()
    assert len(got) == n
    for r in got:
        assert (r["label"], r["is_core"]) == want[r["point_id"]], r
    # sanity: >= 3 clusters found, noise exists
    labels = {r["label"] for r in got if r["label"] != -1}
    assert len(labels) >= 3
    assert any(r["label"] == -1 for r in got)
