"""Normalization statistics: dtype contract + numeric parity with the
reference's accumulation loop (H36_dataset.py:205-259)."""

import numpy as np

from pose3d_tpu.data import stats as stats_lib
from pose3d_tpu.data import synthetic


def _reference_loop_stats(dataset):
    """Literal re-statement of the reference's python accumulation."""
    n_frames, n_joints, dim = dataset.shape
    data_sum = np.sum(dataset, axis=0)
    data_mean = np.divide(data_sum, n_frames)
    diff_sq2_sum = np.zeros((n_joints, dim))  # float64
    for i in range(n_frames):
        diff_sq2_sum += np.power(dataset[i] - data_mean, 2)
    data_std = np.sqrt(np.divide(diff_sq2_sum, n_frames))
    return data_mean, data_std


class TestComputeStats:
    def test_dtype_contract(self):
        """mean float32, std float64 — the committed-artifact dtype mix."""
        kp2d, kp3d = synthetic.synthetic_h36m(500)
        s2, s3 = stats_lib.compute_stats(kp2d), stats_lib.compute_stats(kp3d)
        assert s2.mean.dtype == np.float32
        assert s2.std.dtype == np.float64
        assert s3.mean.dtype == np.float32
        assert s3.std.dtype == np.float64

    def test_matches_reference_loop(self):
        _, kp3d = synthetic.synthetic_h36m(500)
        s = stats_lib.compute_stats(kp3d)
        ref_mean, ref_std = _reference_loop_stats(kp3d)
        np.testing.assert_array_equal(s.mean, ref_mean)
        # summation order differs (vectorized vs python loop) => tiny fp drift
        np.testing.assert_allclose(s.std, ref_std, rtol=1e-10)

    def test_minmax_forced_to_unit(self):
        _, kp3d = synthetic.synthetic_h36m(100)
        s = stats_lib.compute_stats(kp3d)
        np.testing.assert_array_equal(s.max, np.ones((17, 3)))
        np.testing.assert_array_equal(s.min, -np.ones((17, 3)))

    def test_save_load_roundtrip(self, tmp_path):
        kp2d, kp3d = synthetic.synthetic_h36m(100)
        for kp, dim in ((kp2d, 2), (kp3d, 3)):
            s = stats_lib.compute_stats(kp)
            stats_lib.save_stats(s, tmp_path)
            loaded = stats_lib.load_stats(tmp_path, dim)
            np.testing.assert_array_equal(loaded.mean, s.mean)
            np.testing.assert_array_equal(loaded.std, s.std)
        # reference file layout
        assert (tmp_path / "mean_train_2d.npy").exists()
        assert (tmp_path / "max_train_3d.npy").exists()

    def test_standardize_destandardize_roundtrip(self):
        _, kp3d = synthetic.synthetic_h36m(200)
        s = stats_lib.compute_stats(kp3d)
        z = stats_lib.standardize(kp3d, s)
        back = stats_lib.destandardize(z, s)
        np.testing.assert_allclose(back, kp3d, atol=1e-5)
        # standardized data has ~zero mean / unit std
        np.testing.assert_allclose(z.mean(axis=0), 0, atol=1e-5)
        np.testing.assert_allclose(z.std(axis=0), 1, atol=1e-3)

    def test_normalize_mode(self):
        kp2d, kp3d = synthetic.synthetic_h36m(50)
        s3 = stats_lib.compute_stats(kp3d)
        z2 = stats_lib.standardize(kp2d, None, normalize=True)
        np.testing.assert_allclose(z2, 2 * kp2d - 1, atol=1e-6)
        z3 = stats_lib.standardize(kp3d, s3, normalize=True)
        # min/max are +-1 so this maps x -> (x+1)/2 - 0.5 = x/2
        np.testing.assert_allclose(z3, kp3d / 2, atol=1e-6)


class TestPreprocess:
    def test_zero_centre_and_split(self, tmp_path):
        from pose3d_tpu.data.h36m import preprocess

        kp2d, kp3d = synthetic.synthetic_h36m(100)
        ds = preprocess(kp2d, kp3d, tmp_path, is_train=True, split_rate=4)
        assert len(ds) == 25
        np.testing.assert_allclose(ds.kp3d[:, 0], 0, atol=1e-7)

    def test_eval_reads_train_stats(self, tmp_path):
        from pose3d_tpu.data.h36m import preprocess

        kp2d, kp3d = synthetic.synthetic_h36m(100)
        preprocess(kp2d, kp3d, tmp_path, is_train=True)
        kp2e, kp3e = synthetic.synthetic_h36m(40, seed=1)
        ds = preprocess(kp2e, kp3e, tmp_path, is_train=False,
                        standardize_3d=True)
        assert ds.stats3d.mean.dtype == np.float32

    def test_16_joint_mode(self, tmp_path):
        from pose3d_tpu.data.h36m import preprocess

        kp2d, kp3d = synthetic.synthetic_h36m(50)
        ds = preprocess(kp2d, kp3d, tmp_path, is_train=True, num_joints=16)
        assert ds.kp3d.shape[1:] == (16, 3)
        assert ds.kp2d.shape[1:] == (16, 2)
