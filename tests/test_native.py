"""Native packer ↔ numpy reference equivalence (bit-identical outputs)."""

import numpy as np
import pytest

from genrec_tpu.data import datasets, native_packer, synthetic, tiger_tokens

pytestmark = pytest.mark.skipif(not native_packer.available(),
                                reason="native library not built "
                                       "(make -C native)")


@pytest.fixture(scope="module")
def corpus():
    return synthetic.make_interactions(num_users=400, num_items=90, min_len=2,
                                       max_len=30, seed=3)


@pytest.mark.parametrize("mode", ["train", "test"])
def test_sasrec_pack_matches_numpy(corpus, mode):
    ref = datasets.build_sasrec_arrays(corpus, max_len=12, mode=mode,
                                       min_seq_len=3, use_native=False)
    nat = datasets.build_sasrec_arrays(corpus, max_len=12, mode=mode,
                                       min_seq_len=3, use_native=True)
    np.testing.assert_array_equal(ref.inputs, nat.inputs)
    np.testing.assert_array_equal(ref.targets, nat.targets)
    assert ref.item_num == nat.item_num


def test_tiger_pack_matches_numpy(corpus):
    codes = synthetic.make_codes(90, seed=1)
    train, test = tiger_tokens.build_tiger_splits(
        corpus.item_id_lists, corpus.user_ids, codes)
    for split, mt in ((train, None), (test, 1)):
        ref = datasets.build_tiger_arrays(split, max_len=10,
                                          max_target_items=mt,
                                          use_native=False)
        nat = datasets.build_tiger_arrays(split, max_len=10,
                                          max_target_items=mt,
                                          use_native=True)
        np.testing.assert_array_equal(ref.input_ids, nat.input_ids)
        np.testing.assert_array_equal(ref.attention_mask, nat.attention_mask)
        np.testing.assert_array_equal(ref.labels, nat.labels)
        np.testing.assert_array_equal(ref.user_ids, nat.user_ids)


def test_dense_t5_pack_matches_numpy(corpus):
    ref = datasets.build_dense_t5_arrays(corpus, max_seq_len=8, mode="train",
                                         use_native=False)
    nat = datasets.build_dense_t5_arrays(corpus, max_seq_len=8, mode="train",
                                         use_native=True)
    np.testing.assert_array_equal(ref.history_ids, nat.history_ids)
    np.testing.assert_array_equal(ref.seq_lens, nat.seq_lens)
    np.testing.assert_array_equal(ref.target_ids, nat.target_ids)
    np.testing.assert_array_equal(ref.user_ids, nat.user_ids)


def test_native_faster_at_scale():
    """Sanity: the native path handles a large split quickly."""
    import time
    big = synthetic.make_interactions(num_users=20000, num_items=500,
                                      min_len=3, max_len=40, seed=9)
    t0 = time.perf_counter()
    nat = datasets.build_sasrec_arrays(big, max_len=20, mode="train",
                                       use_native=True)
    t_native = time.perf_counter() - t0
    assert nat.inputs.shape[0] == 20000
    assert t_native < 2.0
