"""Graph query kernels (pagerank / triangles / bfs_hops) vs numpy
brute-force references on the same synthetic 3-out-regular graph the
queries build from the documents table."""

import numpy as np

from gdal_ray.pipelines.queries import (_BFS_INF, _BFS_ROUNDS, _PR_ITERS,
                                        _PR_N, _PR_SCALE, q_bfs_hops,
                                        q_pagerank, q_triangles)

SF = "/root/testdata/sf0.001"


def _graph(n_docs: int):
    v = np.arange(n_docs, dtype=np.int64)
    src = np.concatenate([v, v, v])
    dst = np.concatenate([(v * 7 + 1) % _PR_N, (v * 13 + 3) % _PR_N,
                          (v * 31 + 7) % _PR_N])
    return v, src, dst


def _n_docs():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_numpy()
    return int((ids < _PR_N).sum())


def test_pagerank_matches_brute(ray_session):
    n = _n_docs()
    nodes, src, dst = _graph(n)
    r = {int(v): _PR_SCALE // _PR_N for v in nodes}
    base = (15 * (_PR_SCALE // _PR_N)) // 100
    for _ in range(_PR_ITERS):
        s = {int(v): 0 for v in nodes}
        for u, w in zip(src, dst):
            if int(w) in s:
                s[int(w)] += r[int(u)] // 3
        r = {v: base + (85 * s[v]) // 100 for v in s}
    got = {row["node"]: row["rank"] for row in q_pagerank(SF).take_all()}
    assert got == r


def test_triangles_matches_brute(ray_session):
    n = _n_docs()
    _, src, dst = _graph(n)
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    keep = lo != hi
    edges = {(int(a), int(b)) for a, b in zip(lo[keep], hi[keep])}
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
    count = 0
    for a, nb in nbrs.items():
        nb_s = sorted(x for x in nb if x > a)
        for i in range(len(nb_s)):
            for j in range(i + 1, len(nb_s)):
                if (nb_s[i], nb_s[j]) in edges:
                    count += 1
    got = q_triangles(SF).take_all()
    assert len(got) == 1 and got[0]["n_triangles"] == count


def test_bfs_hops_matches_brute(ray_session):
    n = _n_docs()
    nodes, src, dst = _graph(n)
    keep = src != dst
    adj: dict[int, set[int]] = {}
    for a, b in zip(src[keep], dst[keep]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    verts = set(map(int, nodes)) | set(adj)
    d = {v: (0 if v == 0 else _BFS_INF) for v in verts}
    for _ in range(_BFS_ROUNDS):
        nd = dict(d)
        for u, nb in adj.items():
            for w in nb:
                nd[w] = min(nd[w], d[u] + 1)
        d = nd
    want = {v: (d[v] if d[v] < _BFS_INF else -1)
            for v in map(int, nodes)}
    got = {row["node"]: row["hops"] for row in q_bfs_hops(SF).take_all()}
    assert got == want
