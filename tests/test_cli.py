"""CLI surface: every command runs in-process against a tmp lake."""

import json

from nyc_taxi_data_pipeline_ray.__main__ import main


def test_cli_roundtrip(tmp_path, capsys):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    assert main(["generate", "--wal", wal, "--epochs", "2",
                 "--events-per-epoch", "400", "--conversations", "40"]) == 0
    assert main(["apply", "--wal", wal, "--lake", lake, "--partitions", "4"]) == 0
    assert main(["lag", "--wal", wal, "--lake", lake]) == 0
    assert main(["metrics", "--lake", lake]) == 0
    assert main(["check", "--lake", lake]) == 0
    assert main(["compact", "--lake", lake]) == 0
    out = str(tmp_path / "snap")
    assert main(["snapshot", "--lake", lake, "--out", out]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert any("rows_in" in d for d in lines)
    lag = next(d for d in lines if "epochs_behind" in d)
    assert lag["epochs_behind"] == 0
    check = next(d for d in lines if "passed" in d)
    assert check["passed"]
