"""Round-trip tests for every HDF5/NPY data contract (SURVEY.md §2.6)."""

import numpy as np
import pytest

from genrec_tpu.data import contracts, synthetic


def test_interactions_roundtrip(tmp_path, small_interactions):
    p = str(tmp_path / "user_item_interact.h5")
    contracts.write_interactions(p, small_interactions)
    back = contracts.read_interactions(p)
    assert np.array_equal(back.user_ids, small_interactions.user_ids)
    assert back.user_profiles == small_interactions.user_profiles
    assert len(back.item_id_lists) == len(small_interactions.item_id_lists)
    for a, b in zip(back.item_id_lists, small_interactions.item_id_lists):
        assert np.array_equal(a, b)
    # user ids are 1-based contiguous (check_data_alignment.py:224-233)
    assert np.array_equal(back.user_ids, np.arange(1, back.num_users + 1))


def test_item_embs_roundtrip(tmp_path):
    p = str(tmp_path / "course_item_embs.h5")
    table = synthetic.make_item_embs(num_items=10, dim=16)
    contracts.write_item_embs(p, table, meta={"model_name": "synthetic"})
    back, meta = contracts.read_item_embs(p)
    np.testing.assert_allclose(back, table)
    assert meta["model_name"] == "synthetic"
    assert meta["dim"] == 16
    # row 0 is the zero padding row (T5/item_encode.py:99-101)
    assert np.all(back[0] == 0)


def test_user_embs_roundtrip(tmp_path):
    p = str(tmp_path / "user_profile_embs.h5")
    embs = synthetic.make_user_embs(num_users=7, dim=8)
    contracts.write_user_embs(p, embs)
    np.testing.assert_allclose(contracts.read_user_embs(p), embs)


def test_course_info_and_id_map_roundtrip(tmp_path):
    info_p = str(tmp_path / "course_info.h5")
    contracts.write_course_info(info_p, ["C_1", "C_2"], ["algebra", "calculus"],
                                ["about a", "about b"])
    ids, names, infos = contracts.read_course_info(info_p)
    assert ids == ["C_1", "C_2"] and names == ["algebra", "calculus"]

    map_p = str(tmp_path / "course_id_map.h5")
    contracts.write_id_map(map_p, ["C_1", "C_2"], [1, 2])
    assert contracts.read_id_map(map_p) == {"C_1": 1, "C_2": 2}


def test_codes_roundtrip(tmp_path):
    p = str(tmp_path / "course_rqvae_codes.npy")
    codes = synthetic.make_codes(num_items=30, codebook_size=8, num_levels=3)
    contracts.write_codes(p, codes)
    back = contracts.read_codes(p)
    assert back.shape == (31, 4)
    np.testing.assert_array_equal(back, codes)
    # collision-free after 4th-digit dedup (RQ-VAE/infer.py:150-171)
    assert len(np.unique(back, axis=0)) == len(back)


def test_tiger_split_roundtrip(tmp_path):
    p = str(tmp_path / "train_dataset.h5")
    split = contracts.TigerSplit(
        user_ids=np.array([1, 2], dtype=np.int32),
        histories=[np.array([1, 9, 17, 25], np.int32),
                   np.array([1, 9, 17, 25, 2, 10, 18, 26], np.int32)],
        targets=[np.array([2, 10, 18, 26], np.int32),
                 np.array([3, 11, 19, 27], np.int32)],
    )
    contracts.write_tiger_split(p, split)
    back = contracts.read_tiger_split(p)
    assert np.array_equal(back.user_ids, split.user_ids)
    for a, b in zip(back.histories, split.histories):
        assert np.array_equal(a, b)
    for a, b in zip(back.targets, split.targets):
        assert np.array_equal(a, b)


def test_prof_lvl_roundtrip(tmp_path):
    p = str(tmp_path / "prof_lvl1.h5")
    uids, embs = synthetic.make_prof_embs(num_users=5, num_vectors=5, dim=12)
    contracts.write_prof_lvl(p, uids, embs)
    buids, bembs = contracts.read_prof_lvl(p)
    assert np.array_equal(buids, uids)
    np.testing.assert_allclose(bembs, embs)
    assert bembs.shape == (5, 5, 12)


def test_recommendation_data_roundtrip(tmp_path):
    p = str(tmp_path / "recommendation_data.h5")
    classes = {"class_id": np.array([1, 2]), "name": np.array(["a", "b"], dtype=object)}
    interactions = {"student_id": np.array([1, 1, 2]), "class_id": np.array([1, 2, 1]),
                    "preference": np.array([1.0, 0.5, 0.0])}
    students = {"student_id": np.array([1, 2]), "major": np.array(["cs", "math"], dtype=object)}
    contracts.write_recommendation_data(p, classes, interactions, students)
    c, i, s = contracts.read_recommendation_data(p)
    assert np.array_equal(c["class_id"], classes["class_id"])
    assert list(s["major"]) == ["cs", "math"]
    np.testing.assert_allclose(i["preference"], interactions["preference"])


def test_mooccube_etl(tmp_path):
    import json
    from genrec_tpu.data.contracts import (read_course_info, read_id_map,
                                           read_interactions)
    from genrec_tpu.data.etl import mooccube_to_contracts
    courses = [{"id": "C_1", "name": "algebra", "about": "math course"},
               {"id": "C_2", "name": "poetry", "about": "art course"}]
    users = [{"id": "U_a", "name": "alice", "course_order": ["C_1", "C_2"]},
             {"id": "U_b", "name": "bob", "course_order": ["C_2", "C_x"]},
             {"id": "U_a", "name": "dup", "course_order": []}]  # dup skipped
    cj, uj = tmp_path / "course.json", tmp_path / "user.json"
    cj.write_text("\n".join(json.dumps(c) for c in courses))
    uj.write_text("\n".join(json.dumps(u) for u in users))

    out = str(tmp_path / "data")
    data = mooccube_to_contracts(str(cj), str(uj), out)
    assert data.num_users == 2
    got = read_interactions(out + "/user_item_interact.h5")
    assert list(got.user_ids) == [1, 2]
    assert got.user_profiles == ["alice", "bob"]
    item_map = read_id_map(out + "/course_id_map.h5", key_prefix="item")
    # dense 1-based in first-seen order, incl. off-catalog C_x
    assert item_map == {"C_1": 1, "C_2": 2, "C_x": 3}
    assert got.item_id_lists[1].tolist() == [2, 3]
    ids, names, infos = read_course_info(out + "/course_info.h5")
    assert ids == ["C_1", "C_2", "C_x"]
    assert names == ["algebra", "poetry", ""]  # off-catalog → empty
    user_map = read_id_map(out + "/user_id_map.h5", key_prefix="user")
    assert user_map == {"U_a": 1, "U_b": 2}
