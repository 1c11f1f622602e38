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


def test_xlsx_roundtrip_and_major_hierarchy(tmp_path):
    """stdlib xlsx writer → reader round-trip, then the 3-sheet major
    hierarchy ingestion (`major-encode/bert_emb.py:50-124` semantics)."""
    from genrec_tpu.encoding.bert_encoders import (encode_major_hierarchy,
                                                   load_major_hierarchy_xlsx)
    from genrec_tpu.utils.xlsx import Workbook, write_xlsx

    path = str(tmp_path / "majors.xlsx")
    sheets = {
        "Level1": [
            ["大类代码", "大类名称", "大类简介及培养目标", "大类通识课程"],
            ["01", "哲学", "研究智慧之学", "哲学导论, 逻辑学"],
            [None, "空行应被跳过", "x", "y"],
            ["02", "经济学", None, "微观经济学"],
        ],
        "Level2": [
            ["代码", "名称", "简介", "核心课程"],
            ["0101", "哲学", "本专业培养...", "中国哲学史"],
            ["0101", "伦理学", "分流专业同码", None],
        ],
        "Level3": [
            ["代码", "名称", "学类简介及培养目标"],
            ["010101", "马克思主义哲学", "简介文本"],
            ["010102", "外国哲学", None],  # 空简介 → 退回名称
        ],
    }
    write_xlsx(path, sheets)

    wb = Workbook(path)
    assert wb.sheet_names == ["Level1", "Level2", "Level3"]
    rows = wb.rows("Level1")
    assert rows[0][0] == "大类代码" and rows[1][1] == "哲学"
    wb.close()

    levels = load_major_hierarchy_xlsx(path)
    l1, l2, l3 = levels
    assert l1 == [
        ("01", "哲学", "研究智慧之学 大类通识课程：哲学导论, 逻辑学"),
        ("02", "经济学", "大类通识课程：微观经济学"),
    ]
    assert l2 == [
        ("0101", "哲学", "本专业培养... 专业核心课程：中国哲学史"),
        ("0101", "伦理学", "分流专业同码"),
    ]
    assert l3 == [
        ("010101", "马克思主义哲学", "简介文本"),
        ("010102", "外国哲学", "外国哲学"),
    ]

    # encodes the assembled text (hash-embed fallback is deterministic)
    enc = encode_major_hierarchy(levels, encoder=None, dim=32)
    assert len(enc) == 3 and enc[0]["embs"].shape == (2, 32)
    assert list(enc[0]["codes"]) == ["01", "02"]
    # numeric cells survive as numbers via the generic reader
    write_xlsx(path, {"S": [["a", 1, 2.5, True, None, "b"]]})
    wb = Workbook(path)
    assert wb.rows("S")[0] == ["a", 1, 2.5, True, None, "b"]
    wb.close()
