"""Utils tests: visualizer math, profiling, CSV appender, CLI synth."""

import json
import os

import numpy as np

from genrec_tpu.utils.csv_results import append_results_csv
from genrec_tpu.utils.visualize import (longest_common_prefix_len,
                                        prefix_counts,
                                        prefix_distance_matrix,
                                        write_summary_csvs)


def test_lcp_and_distance_matrix():
    assert longest_common_prefix_len([1, 2, 3], [1, 2, 9]) == 2
    assert longest_common_prefix_len([1], [2]) == 0
    codes = np.array([[1, 2, 3], [1, 2, 9], [5, 5, 5]])
    d = prefix_distance_matrix(codes)
    assert d[0, 0] == 0
    assert d[0, 1] == 1  # LCP 2 of 3 levels
    assert d[0, 2] == 3  # no common prefix
    assert (d == d.T).all()


def test_prefix_counts():
    codes = np.array([[1, 2], [1, 3], [2, 2]])
    assert prefix_counts(codes, 1) == {(1,): 2, (2,): 1}
    assert prefix_counts(codes, 2) == {(1, 2): 1, (1, 3): 1, (2, 2): 1}


def test_summary_csvs(tmp_path):
    codes = np.array([[1, 2, 3, 0], [1, 2, 4, 0], [2, 0, 0, 0]])
    write_summary_csvs(codes, ["a", "b", "c"], str(tmp_path))
    assert (tmp_path / "course_semantic_id_alignment.csv").exists()
    lines = (tmp_path / "prefix1_counts.csv").read_text().strip().split("\n")
    assert lines[0] == "prefix,count"
    assert "1,2" in lines[1]


def test_csv_appender(tmp_path):
    p = str(tmp_path / "r.csv")
    append_results_csv(p, {"task_id": "t", "Hit@10": 0.5})
    append_results_csv(p, {"task_id": "t2", "Hit@10": 0.25})
    lines = open(p).read().strip().split("\n")
    assert lines[0] == "task_id,Hit@10"
    assert lines[1] == "t,0.500000" and lines[2] == "t2,0.250000"


def test_step_timer():
    from genrec_tpu.utils.profiling import StepTimer
    t = StepTimer(sync_every=2)
    assert t.tick(10) is None
    stats = t.tick(10)
    assert stats is not None and stats["steps"] == 2
    assert stats["examples_per_sec"] > 0


def test_cli_synth_roundtrip(tmp_path):
    from genrec_tpu import cli
    from genrec_tpu.data import contracts
    out = str(tmp_path / "d")
    cli.main(["synth", "--out", out, "--users", "30", "--items", "20",
              "--max-len", "8"])
    data = contracts.read_interactions(os.path.join(out, "user_item_interact.h5"))
    assert data.num_users == 30
    codes = contracts.read_codes(os.path.join(out, "course",
                                              "course_rqvae_codes.npy"))
    assert codes.shape == (21, 4)
    split = contracts.read_tiger_split(os.path.join(out, "tiger",
                                                    "train_dataset.h5"))
    assert len(split.histories) > 0
