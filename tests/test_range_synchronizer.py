"""RangeDataSynchronizer tests (C8; the reference has none — new coverage)
plus metrics and multi-LiDAR/background-pool MapBuilder smoke."""

import numpy as np

from dliom_tpu.metrics.metrics import FamilyFactory, Histogram
from dliom_tpu.sensor.range_synchronizer import RangeDataSynchronizer


def test_secondary_merges_into_primary_window():
    sync = RangeDataSynchronizer(["a", "b"], scan_period=0.1)
    # secondary cloud: stamped at 9.98, points spread [-0.05, 0]
    sec_pts = np.array([[1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]], np.float32)
    sec_times = np.array([-0.05, -0.02, 0.0], np.float32)
    assert sync.add_range_data("b", 9.98, sec_pts, sec_times) is None
    # primary at 10.0 with points spanning [-0.1, 0] -> window [9.9, 10.0]
    pri_pts = np.array([[10.0, 0, 0], [20.0, 0, 0]], np.float32)
    pri_times = np.array([-0.1, 0.0], np.float32)
    stamp, pts, tms = sync.add_range_data("a", 10.0, pri_pts, pri_times)
    assert stamp == 10.0
    # all 3 secondary points fall in the window (abs 9.93, 9.96, 9.98)
    assert pts.shape[0] == 5
    # times rebased to the primary end and sorted ascending
    assert np.all(np.diff(tms) >= 0)
    np.testing.assert_allclose(sorted(tms), [-0.1, -0.07, -0.04, -0.02, 0.0], atol=1e-6)
    # the rebased secondary entries map to their original points
    i = np.argmin(np.abs(tms - (-0.07)))
    np.testing.assert_allclose(pts[i], [1.0, 0, 0])


def test_secondary_future_cloud_survives_for_next_scan():
    sync = RangeDataSynchronizer(["a", "b"], scan_period=0.1)
    sync.add_range_data("b", 10.05, np.full((2, 3), 2.0, np.float32),
                        np.array([-0.02, 0.0], np.float32))
    _, pts1, _ = sync.add_range_data(
        "a", 10.0, np.zeros((2, 3), np.float32), np.array([-0.1, 0.0], np.float32)
    )
    assert pts1.shape[0] == 2  # future secondary not merged yet
    _, pts2, _ = sync.add_range_data(
        "a", 10.1, np.zeros((2, 3), np.float32), np.array([-0.1, 0.0], np.float32)
    )
    assert pts2.shape[0] == 4  # now it falls in [10.0, 10.1]


def test_stamp_range_data_synthesis():
    sync = RangeDataSynchronizer(["a"], scan_period=0.2)
    pts = np.zeros((5, 3), np.float32)
    t = sync.stamp_range_data(pts, None)
    np.testing.assert_allclose(t, [-0.2, -0.15, -0.1, -0.05, 0.0], atol=1e-6)
    # existing nonzero times pass through
    t2 = sync.stamp_range_data(pts, np.array([-0.3, -0.2, -0.1, -0.05, 0.0]))
    np.testing.assert_allclose(t2, [-0.3, -0.2, -0.1, -0.05, 0.0])


def test_metrics_families():
    f = FamilyFactory()
    c = f.new_counter_family("x_total", "counts x").add({"kind": "a"})
    c.increment(); c.increment(2.0)
    assert c.value == 3.0
    g = f.new_gauge_family("y", "gauge").add()
    g.set(5.0); g.decrement()
    assert g.value == 4.0
    h = f.new_histogram_family("z", "hist", Histogram.fixed_width(1.0, 4)).add()
    for v in [0.5, 1.5, 3.7, 10.0]:
        h.observe(v)
    assert h.count == 4
    assert abs(h.mean - (0.5 + 1.5 + 3.7 + 10.0) / 4) < 1e-9
    text = f.dump_text()
    assert "x_total" in text and "z_count" in text


def test_compressed_point_cloud_roundtrip():
    """sensor::CompressedPointCloud analog: 1mm-lossy roundtrip, ~4.4 B/pt."""
    import numpy as np
    from dliom_tpu.sensor.compressed_point_cloud import compress, decompress

    rng = np.random.default_rng(0)
    # dense scan-like cloud: points concentrated on nearby surfaces, so
    # many share 1.024 m blocks (the reference's compression regime)
    pts = rng.uniform(-5, 5, (20000, 3)).astype(np.float32)
    c = compress(pts)
    out = decompress(c)
    assert out.shape == pts.shape
    # order changes (block-sorted); compare exact quantized-mm multisets
    mm_a = np.round(pts / 0.001).astype(np.int64)
    mm_b = np.round(out.astype(np.float64) / 0.001).astype(np.int64)
    a = mm_a[np.lexsort(mm_a.T)]
    b = mm_b[np.lexsort(mm_b.T)]
    np.testing.assert_array_equal(a, b)
    # quantization error ~0.5 mm per axis (+f32 division ulp at 80 m)
    assert np.max(np.abs(mm_a * 0.001 - pts)) <= 0.0006
    assert c.nbytes < 0.5 * pts.nbytes  # beats raw storage


def test_compressed_point_cloud_negative_and_duplicate():
    import numpy as np
    from dliom_tpu.sensor.compressed_point_cloud import compress, decompress

    pts = np.asarray([[-1.2345, 0.0005, -7.999], [-1.2345, 0.0005, -7.999],
                      [3.0, -3.0, 0.0]], np.float32)
    out = decompress(compress(pts))
    assert out.shape == (3, 3)
    a = pts[np.lexsort(pts.T)]
    b = out[np.lexsort(out.T)]
    assert np.max(np.abs(a - b)) <= 0.0006
