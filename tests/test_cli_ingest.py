"""Incremental ingest door: only new/changed images are read per run."""

import json
import os

import numpy as np

from gdal_ray.codecs import encode


def test_cli_ingest_incremental(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    src = tmp_path / "imgs"
    out = tmp_path / "table"
    os.makedirs(src)
    img = (np.arange(64).reshape(8, 8) % 256).astype(np.uint8)
    (src / "a.png").write_bytes(encode(img, "png"))
    (src / "b.png").write_bytes(encode(img + 1, "png"))

    rc = main(["ingest", "--src", str(src), "--out", str(out),
               "--suffix", ".png"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["added"] == 2 and rep["files_ingested"] == 2
    run1 = rep["run_dir"]

    # second run with nothing new: no Ray work, no new run dir
    rc = main(["ingest", "--src", str(src), "--out", str(out),
               "--suffix", ".png"])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["skipped_run"] is True and rep2["rows"] == 0

    # add one file: only it is ingested, into a NEW run dir
    (src / "c.png").write_bytes(encode(img + 2, "png"))
    rc = main(["ingest", "--src", str(src), "--out", str(out),
               "--suffix", ".png"])
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["added"] == 1 and rep3["files_ingested"] == 1
    assert rep3["run_dir"] != run1

    # the table now holds exactly the 3 images across run dirs
    import pyarrow.dataset as pads
    runs = [os.path.join(out, d) for d in sorted(os.listdir(out))
            if d.startswith("run-")]
    total = sum(pads.dataset(r).count_rows() for r in runs)
    assert total == 3
