"""Geodetic conversion tests — numeric port of the reference's
msg_conversion_test.cc (LatLongAltToEcef / ComputeLocalFrameFromLatLong)."""

import numpy as np

from dliom_tpu.io.geodesy import (
    NavSatConverter,
    compute_local_frame_from_lat_long,
    lat_long_alt_to_ecef,
)


def test_lat_long_alt_to_ecef():
    np.testing.assert_allclose(
        lat_long_alt_to_ecef(0, 0, 0), [6378137, 0, 0], atol=1e-6
    )
    np.testing.assert_allclose(
        lat_long_alt_to_ecef(0, 0, 10), [6378147, 0, 0], atol=1e-6
    )
    np.testing.assert_allclose(
        lat_long_alt_to_ecef(90, 0, 0), [0, 0, 6356752.3142], atol=1e-3
    )
    np.testing.assert_allclose(
        lat_long_alt_to_ecef(90, 90, 0), [0, 0, 6356752.3142], atol=1e-3
    )
    np.testing.assert_allclose(
        lat_long_alt_to_ecef(-90, 0, 0), [0, 0, -6356752.3142], atol=1e-3
    )
    np.testing.assert_allclose(
        lat_long_alt_to_ecef(-90, 60, 20), [0, 0, -6356772.3142], atol=1e-3
    )
    # Munich (reference "somewhere_on_earth")
    np.testing.assert_allclose(
        lat_long_alt_to_ecef(48.1372149, 11.5748024, 517.1),
        [4177983, 855702, 4727457],
        rtol=1e-6,
    )


def test_compute_local_frame_maps_up_to_z():
    # at the anchor, a point `alt` above the surface lands at alt * e_z
    for lat, lon in [(90.0, 0.0), (-90.0, 0.0), (0.0, 0.0), (0.0, 90.0)]:
        rot, trans = compute_local_frame_from_lat_long(lat, lon)
        local = rot @ lat_long_alt_to_ecef(lat, lon, 1.0) + trans
        np.testing.assert_allclose(local, [0, 0, 1], atol=1e-9)
    rng = np.random.default_rng(42)
    for _ in range(200):
        lat = rng.uniform(-90, 90)
        lon = rng.uniform(-180, 180)
        alt = rng.uniform(-519, 519)
        rot, trans = compute_local_frame_from_lat_long(lat, lon)
        local = rot @ lat_long_alt_to_ecef(lat, lon, alt) + trans
        np.testing.assert_allclose(local, [0, 0, alt], atol=1e-6)


def test_navsat_converter_first_fix_anchors():
    conv = NavSatConverter()
    first = conv.to_local(48.1372149, 11.5748024, 517.1)
    np.testing.assert_allclose(first, [0, 0, 517.1], atol=1e-6)
    assert conv.anchored
    # ~111 m north per 0.001 deg latitude at the anchor
    moved = conv.to_local(48.1382149, 11.5748024, 517.1)
    assert 80.0 < np.linalg.norm(moved - first) < 140.0
    # local +y axis of the reference frame points... verify pure-up change
    up = conv.to_local(48.1372149, 11.5748024, 527.1)
    np.testing.assert_allclose(up - first, [0, 0, 10.0], atol=1e-3)


def test_map_builder_navsat_ingest():
    from dliom_tpu.common.config import load_config
    from dliom_tpu.map_builder import MapBuilder

    builder = MapBuilder(load_config("basic"))
    builder.add_navsat_data(0.0, 48.1372149, 11.5748024, 517.1)
    builder.add_navsat_data(0.1, 48.1372160, 11.5748024, 517.1)
    buf = builder._trajectories[0]._ff_buffer
    assert len(buf) == 2
    np.testing.assert_allclose(buf[0][1], [0, 0, 517.1], atol=1e-3)
