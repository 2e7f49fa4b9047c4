"""PROJ.4-string / CF-grid-mapping CRS resolution (crsparse.py).

Strategy: the proj4 and CF paths must produce transforms NUMERICALLY
IDENTICAL to the pre-registered EPSG codes (which are themselves
pinned to vendored control points in test_crs_control_points.py) —
same family math, same parameters, so the doubles must match
bit-for-bit.  Plus an arbitrary-parameter round-trip that no EPSG
code covers, and the documented rejection contract.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xcube_spark.operators.resampling.crsparse import (
    crs_from_cf,
    parse_proj4,
    resolve_crs,
    resolve_proj4,
)
from xcube_spark.operators.resampling.reproject import (
    apply_transform_df,
    get_transform,
)

_PTS = [(-6.5, 41.2), (3.0, 46.5), (12.25, 55.75), (24.0, 62.0),
        (173.7, -41.3)]


def _fwd_points(spark, crs, pts=_PTS):
    fwd = get_transform("EPSG:4326", crs)
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                             "px", "py")
    return sorted((r.lon, r.lat, r.px, r.py) for r in out.collect())


def _assert_same_transform(spark, crs_a, crs_b, pts=_PTS):
    a = _fwd_points(spark, crs_a, pts)
    b = _fwd_points(spark, crs_b, pts)
    assert a == b, (crs_a, crs_b)


def test_parse_proj4_tokens():
    p = parse_proj4("+proj=utm +zone=33 +south +ellps=WGS84")
    assert p == {"proj": "utm", "zone": "33", "south": "",
                 "ellps": "WGS84"}
    with pytest.raises(ValueError):
        parse_proj4("proj=utm")
    with pytest.raises(ValueError):
        parse_proj4("+ellps=WGS84")


def test_proj4_utm_wgs84_is_epsg(spark):
    assert resolve_proj4("+proj=utm +zone=33 +ellps=WGS84") == \
        "EPSG:32633"
    assert resolve_proj4(
        "+proj=utm +zone=19 +south +datum=WGS84") == "EPSG:32719"


def test_proj4_tmerc_matches_nztm(spark):
    # EPSG:2193 (NZTM2000) restated as its published PROJ.4 string
    key = resolve_proj4(
        "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
        "+y_0=10000000 +ellps=GRS80")
    _assert_same_transform(spark, key, "EPSG:2193",
                           pts=[(173.7, -41.3), (168.0, -46.5)])


def test_proj4_utm_grs80_matches_etrs89(spark):
    # +ellps=GRS80 UTM is NOT the EPSG:326xx WGS84 CRS — it must
    # resolve through the general TM family and equal EPSG:25832
    key = resolve_proj4("+proj=utm +zone=32 +ellps=GRS80")
    assert key != "EPSG:32632"
    _assert_same_transform(spark, key, "EPSG:25832",
                           pts=[(9.5, 52.0), (7.0, 47.8)])


def test_proj4_lcc_matches_lambert93(spark):
    key = resolve_proj4(
        "+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 "
        "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    _assert_same_transform(spark, key, "EPSG:2154",
                           pts=[(3.0, 46.5), (-1.5, 48.1), (6.2, 43.4)])


def test_proj4_laea_matches_etrs89_laea(spark):
    key = resolve_proj4(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
        "+ellps=GRS80")
    _assert_same_transform(spark, key, "EPSG:3035",
                           pts=[(10.0, 52.0), (24.0, 62.0), (-6.5, 41.2)])


def test_proj4_aea_matches_conus_albers(spark):
    key = resolve_proj4(
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
        "+ellps=GRS80")
    _assert_same_transform(spark, key, "EPSG:5070",
                           pts=[(-96.0, 23.0), (-120.5, 47.6), (-71.1, 42.3)])


def test_proj4_polar_stere_matches_nsidc(spark):
    key = resolve_proj4(
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84")
    _assert_same_transform(spark, key, "EPSG:3413",
                           pts=[(-45.0, 70.0), (10.0, 80.0), (-100.0, 75.0)])


def test_proj4_sinu_matches_modis(spark):
    key = resolve_proj4("+proj=sinu +R=6371007.181")
    _assert_same_transform(spark, key, "SR-ORG:6974",
                           pts=[(0.0, 0.0), (20.0, 45.0), (-60.0, -30.0)])


def test_proj4_moll_matches_esri54009(spark):
    key = resolve_proj4("+proj=moll +a=6378137 +b=6378137")
    _assert_same_transform(spark, key, "ESRI:54009",
                           pts=[(0.0, 0.0), (20.0, 45.0), (-60.0, -30.0)])


def test_proj4_web_mercator_and_longlat():
    assert resolve_proj4(
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 "
        "+x_0=0 +y_0=0 +k=1") == "EPSG:3857"
    assert resolve_proj4("+proj=longlat +datum=WGS84") == "EPSG:4326"
    assert resolve_proj4("+init=epsg:32633") == "EPSG:32633"


def test_proj4_arbitrary_tmerc_roundtrips(spark):
    """Parameters no EPSG code covers (Airy ellipsoid, odd origin,
    k>1): forward then inverse must recover lon/lat to < 1e-7 deg
    (~1 cm; the Krueger series is 4th-order in n) — exercises
    genuinely arbitrary-parameter support."""
    key = resolve_proj4(
        "+proj=tmerc +lat_0=-37.5 +lon_0=101.25 +k=1.0002 "
        "+x_0=123456 +y_0=-7890 +ellps=airy")
    fwd = get_transform("EPSG:4326", key)
    inv = get_transform(key, "EPSG:4326")
    pts = [(99.0, -35.0), (101.25, -37.5), (103.9, -40.2)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                            "px", "py")
    df = apply_transform_df(df, inv, F.col("px"), F.col("py"),
                            "lon2", "lat2")
    for r in df.collect():
        assert abs(r.lon2 - r.lon) < 1e-7
        assert abs(r.lat2 - r.lat) < 1e-7


def test_cf_transverse_mercator_matches_nztm(spark):
    key = crs_from_cf({
        "grid_mapping_name": "transverse_mercator",
        "latitude_of_projection_origin": 0.0,
        "longitude_of_central_meridian": 173.0,
        "scale_factor_at_central_meridian": 0.9996,
        "false_easting": 1_600_000.0,
        "false_northing": 10_000_000.0,
        "semi_major_axis": 6_378_137.0,
        "inverse_flattening": 298.257222101,
    })
    _assert_same_transform(spark, key, "EPSG:2193",
                           pts=[(173.7, -41.3), (168.0, -46.5)])


def test_cf_lcc_matches_lambert93(spark):
    key = crs_from_cf({
        "grid_mapping_name": "lambert_conformal_conic",
        "standard_parallel": [44.0, 49.0],
        "latitude_of_projection_origin": 46.5,
        "longitude_of_central_meridian": 3.0,
        "false_easting": 700_000.0,
        "false_northing": 6_600_000.0,
        "semi_major_axis": 6_378_137.0,
        "inverse_flattening": 298.257222101,
    })
    _assert_same_transform(spark, key, "EPSG:2154",
                           pts=[(3.0, 46.5), (-1.5, 48.1)])


def test_cf_polar_stereographic_matches_antarctic(spark):
    key = crs_from_cf({
        "grid_mapping_name": "polar_stereographic",
        "latitude_of_projection_origin": -90.0,
        "straight_vertical_longitude_from_pole": 0.0,
        "standard_parallel": -71.0,
    })
    _assert_same_transform(spark, key, "EPSG:3031",
                           pts=[(0.0, -71.0), (45.0, -80.0), (-120.0, -75.0)])


def test_cf_laea_matches_etrs89(spark):
    key = crs_from_cf({
        "grid_mapping_name": "lambert_azimuthal_equal_area",
        "latitude_of_projection_origin": 52.0,
        "longitude_of_projection_origin": 10.0,
        "false_easting": 4_321_000.0,
        "false_northing": 3_210_000.0,
        "semi_major_axis": 6_378_137.0,
        "inverse_flattening": 298.257222101,
    })
    _assert_same_transform(spark, key, "EPSG:3035",
                           pts=[(10.0, 52.0), (24.0, 62.0)])


def test_cf_sinusoidal_and_latlon():
    key = crs_from_cf({
        "grid_mapping_name": "sinusoidal",
        "earth_radius": 6_371_007.181,
    })
    from xcube_spark.operators.resampling.reproject import SINU_PARAMS
    assert math.isclose(SINU_PARAMS[key], 6_371_007.181)
    assert crs_from_cf(
        {"grid_mapping_name": "latitude_longitude"}) == "EPSG:4326"


def test_resolve_crs_passthrough_and_dispatch():
    assert resolve_crs("EPSG:32633") == "EPSG:32633"
    assert resolve_crs("+proj=longlat") == "EPSG:4326"
    assert resolve_crs(
        {"grid_mapping_name": "latitude_longitude"}) == "EPSG:4326"


def test_get_transform_accepts_proj4_and_cf(spark):
    """End-to-end through the public dispatcher: proj4 src, CF dst."""
    tr = get_transform(
        "+proj=longlat +datum=WGS84",
        {"grid_mapping_name": "transverse_mercator",
         "latitude_of_projection_origin": 0.0,
         "longitude_of_central_meridian": 173.0,
         "scale_factor_at_central_meridian": 0.9996,
         "false_easting": 1_600_000.0,
         "false_northing": 10_000_000.0,
         "semi_major_axis": 6_378_137.0,
         "inverse_flattening": 298.257222101})
    ref = get_transform("EPSG:4326", "EPSG:2193")
    df = spark.createDataFrame([(173.7, -41.3)], "lon double, lat double")
    a = apply_transform_df(df, tr, F.col("lon"), F.col("lat"),
                           "px", "py").collect()[0]
    b = apply_transform_df(df, ref, F.col("lon"), F.col("lat"),
                           "px", "py").collect()[0]
    assert (a.px, a.py) == (b.px, b.py)


def test_unsupported_forms_raise():
    # lcc 1-SP is SUPPORTED since round 8 (tangent cone, k_0=1 only)
    assert resolve_proj4("+proj=lcc +lat_1=44 +lat_0=46.5 +lon_0=3 "
                         "+ellps=GRS80").startswith("PROJ:LCC:")
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=lcc +lat_1=44 +lat_0=46.5 +lon_0=3 "
                      "+k_0=0.99 +ellps=GRS80")  # 1-SP scale form
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=stere +lat_0=52 +lat_ts=52")  # oblique
    # no lat_ts is SUPPORTED since round 8: variant A with k_0
    # defaulting to 1 (scale at the pole)
    assert resolve_proj4("+proj=stere +lat_0=90"
                         ).startswith("PROJ:STERE:")
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=omerc +lat_0=4 +lonc=102")  # no family
    # non-GRS80 conics are SUPPORTED since round 8 (ellipsoid-
    # extended family tuples)
    assert resolve_proj4("+proj=lcc +lat_1=44 +lat_2=49 +ellps=airy"
                         ).endswith("6377563.396,299.3249646".upper())
    with pytest.raises(NotImplementedError):
        crs_from_cf({"grid_mapping_name": "oblique_mercator"})
    with pytest.raises(ValueError):
        crs_from_cf({"grid_mapping_name": "geostationary"})
    # the CF scale-factor polar form is SUPPORTED since round 8
    # (variant A — the UPS family)
    assert crs_from_cf(
        {"grid_mapping_name": "polar_stereographic",
         "latitude_of_projection_origin": 90.0,
         "scale_factor_at_projection_origin": 0.994}
    ).startswith("PROJ:STERE:")


def test_cf_encode_decode_roundtrip_all_families(spark):
    """zarrio's CF encode for every closed-form family must decode —
    WITHOUT the epsg_code hint — to a numerically identical
    transform (canonical key may differ from the EPSG string)."""
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    cases = {
        "EPSG:2193": [(173.7, -41.3)],
        "EPSG:2154": [(3.0, 46.5), (-1.5, 48.1)],
        "EPSG:5070": [(-96.0, 23.0), (-120.5, 47.6)],
        "EPSG:3035": [(10.0, 52.0), (24.0, 62.0)],
        "EPSG:3413": [(-45.0, 70.0), (10.0, 80.0)],
        "EPSG:3031": [(0.0, -71.0), (45.0, -80.0)],
        "SR-ORG:6974": [(20.0, 45.0)],
        "ESRI:54009": [(20.0, 45.0)],
        "EPSG:32633": [(15.0, 52.0)],
        "EPSG:3857": [(12.0, 48.0)],
        "EPSG:3395": [(12.0, 48.0)],
        "EPSG:4326": [(1.0, 2.0)],
    }
    for crs, pts in cases.items():
        attrs = cf_grid_mapping_attrs(crs)
        assert attrs["grid_mapping_name"] != "unknown", crs
        assert crs_from_grid_mapping(attrs) == crs  # epsg hint wins
        attrs.pop("epsg_code")
        decoded = crs_from_grid_mapping(attrs)  # parameters alone
        _assert_same_transform(spark, decoded, crs, pts=pts)


def test_ellipsoidal_mercator_epsg3395(spark):
    """EPSG:3395 World Mercator: x is exactly a*lambda, y matches a
    scalar Snyder 7-7 twin, and the chi-series inverse round-trips to
    <1e-9 deg."""
    fwd = get_transform("EPSG:4326", "EPSG:3395")
    inv = get_transform("EPSG:3395", "EPSG:4326")
    pts = [(0.0, 0.0), (3.0, 53.5), (-60.0, -30.0), (179.0, 71.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                            "px", "py")
    df = apply_transform_df(df, inv, F.col("px"), F.col("py"),
                            "lon2", "lat2")
    a, e = 6378137.0, math.sqrt(1.0 / 298.257223563 *
                                (2.0 - 1.0 / 298.257223563))
    for r in df.collect():
        assert abs(r.px - a * math.radians(r.lon)) < 1e-6
        s = e * math.sin(math.radians(r.lat))
        y_ref = a * math.log(
            math.tan(math.pi / 4.0 + math.radians(r.lat) / 2.0)
            * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
        assert abs(r.py - y_ref) < 1e-6
        assert abs(r.lon2 - r.lon) < 1e-9
        assert abs(r.lat2 - r.lat) < 1e-9
    # distinct from the spherical web mercator at high latitude
    web = _fwd_points(spark, "EPSG:3857", pts=[(0.0, 60.0)])
    ell = _fwd_points(spark, "EPSG:3395", pts=[(0.0, 60.0)])
    assert abs(web[0][3] - ell[0][3]) > 10_000.0


def test_proj4_merc_lat_ts_scales_y(spark):
    """+proj=merc +lat_ts=56.5: y shrinks by k0 = m(lat_ts) relative
    to EPSG:3395 (Snyder 7-8), x likewise."""
    key = resolve_proj4("+proj=merc +lat_ts=56.5 +ellps=WGS84")
    base = _fwd_points(spark, "EPSG:3395", pts=[(12.0, 55.0)])
    scaled = _fwd_points(spark, key, pts=[(12.0, 55.0)])
    e2 = (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563)
    phi = math.radians(56.5)
    k0 = math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)
    assert abs(scaled[0][2] - base[0][2] * k0) < 1e-6
    assert abs(scaled[0][3] - base[0][3] * k0) < 1e-6


def test_cf_mercator_spherical_vs_ellipsoidal(spark):
    """CF mercator attrs resolve by ellipsoid: sphere -> EPSG:3857,
    WGS84 -> the ellipsoidal family (3395 numerics)."""
    assert crs_from_cf({
        "grid_mapping_name": "mercator",
        "standard_parallel": 0.0,
        "semi_major_axis": 6378137.0,
        "semi_minor_axis": 6378137.0,
    }) == "EPSG:3857"
    key = crs_from_cf({
        "grid_mapping_name": "mercator",
        "standard_parallel": 0.0,
        "semi_major_axis": 6378137.0,
        "inverse_flattening": 298.257223563,
    })
    _assert_same_transform(spark, key, "EPSG:3395", pts=[(12.0, 55.0)])


def test_geos_goesr_published_fixed_grid_point(spark):
    """GOES-R ABI fixed grid (PUG L1b navigation example): scan
    angles (x=-0.024052, y=0.095340 rad) on the GOES-East grid
    (lon_0=-75, h=35786023 m, GRS80, sweep x) map to
    (lon=-84.690932, lat=33.846162).  Angles are published to 1e-6
    rad (~40 m ground), so assert to 5e-4 deg."""
    key = resolve_proj4(
        "+proj=geos +h=35786023.0 +lon_0=-75 +sweep=x "
        "+a=6378137 +rf=298.257222096")
    h = 35786023.0
    inv = get_transform(key, "EPSG:4326")
    df = spark.createDataFrame(
        [(-0.024052 * h, 0.095340 * h)], "px double, py double")
    out = apply_transform_df(df, inv, F.col("px"), F.col("py"),
                             "lon", "lat").collect()[0]
    assert abs(out.lon - -84.690932) < 5e-4
    assert abs(out.lat - 33.846162) < 5e-4
    # and forward reproduces the published scan angles
    fwd = get_transform("EPSG:4326", key)
    df2 = spark.createDataFrame(
        [(-84.690932, 33.846162)], "lon double, lat double")
    o2 = apply_transform_df(df2, fwd, F.col("lon"), F.col("lat"),
                            "px", "py").collect()[0]
    assert abs(o2.px / h - -0.024052) < 2e-6
    assert abs(o2.py / h - 0.095340) < 2e-6


def test_geos_roundtrip_and_disk_edge(spark):
    """geos (MSG flavour, sweep y): nadir maps to (0,0), visible
    points round-trip to <1e-9 deg, and points beyond the limb come
    back NaN (the documented not-visible signal)."""
    key = resolve_proj4(
        "+proj=geos +h=35785831.0 +lon_0=0 +sweep=y "
        "+a=6378137 +rf=298.257223563")
    fwd = get_transform("EPSG:4326", key)
    inv = get_transform(key, "EPSG:4326")
    pts = [(0.0, 0.0), (10.0, 45.0), (-40.0, -55.0), (60.0, 20.0),
           (140.0, 0.0)]  # last: far beyond the visible disk
    df = spark.createDataFrame(pts, "lon double, lat double")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                            "px", "py")
    df = apply_transform_df(df, inv, F.col("px"), F.col("py"),
                            "lon2", "lat2")
    rows = {(r.lon, r.lat): r for r in df.collect()}
    r0 = rows[(0.0, 0.0)]
    assert abs(r0.px) < 1e-9 and abs(r0.py) < 1e-9
    for lon, lat in pts[:-1]:
        r = rows[(lon, lat)]
        assert abs(r.lon2 - lon) < 1e-9, (lon, lat)
        assert abs(r.lat2 - lat) < 1e-9, (lon, lat)
    limb = rows[(140.0, 0.0)]
    assert math.isnan(limb.px) and math.isnan(limb.py)


def test_geos_sweep_axes_differ_and_cf(spark):
    """sweep=x vs sweep=y must differ off-axis; CF geostationary
    attrs (incl. the fixed_angle_axis spelling) resolve to the same
    transform as the proj4 string."""
    kx = resolve_proj4("+proj=geos +h=35786023.0 +lon_0=-75 +sweep=x")
    ky = resolve_proj4("+proj=geos +h=35786023.0 +lon_0=-75 +sweep=y")
    ax = _fwd_points(spark, kx, pts=[(-60.0, 40.0)])
    ay = _fwd_points(spark, ky, pts=[(-60.0, 40.0)])
    assert abs(ax[0][2] - ay[0][2]) > 100.0  # metres apart off-axis
    kcf = crs_from_cf({
        "grid_mapping_name": "geostationary",
        "perspective_point_height": 35786023.0,
        "longitude_of_projection_origin": -75.0,
        "sweep_angle_axis": "x",
    })
    _assert_same_transform(spark, kcf, kx, pts=[(-60.0, 40.0)])
    kcf2 = crs_from_cf({
        "grid_mapping_name": "geostationary",
        "perspective_point_height": 35786023.0,
        "longitude_of_projection_origin": -75.0,
        "fixed_angle_axis": "y",  # fixed y == sweep x
    })
    _assert_same_transform(spark, kcf2, kx, pts=[(-60.0, 40.0)])


def test_proj_key_epsg_code_survives_fresh_process(spark):
    """A dataset written with a crsparse-registered 'PROJ:…' CRS key
    records that key as epsg_code, but the key only exists in the
    writing process's in-memory family tables.  The reader must fall
    through to the CF parameters written alongside (ADVICE r7):
    simulate the fresh process by deleting the registration."""
    from xcube_spark.operators.resampling import reproject as R
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    key = resolve_proj4("+proj=geos +h=35786023.0 +lon_0=-75 +sweep=x")
    assert key.startswith("PROJ:")
    attrs = cf_grid_mapping_attrs(key)
    assert attrs["epsg_code"] == key
    assert attrs["grid_mapping_name"] == "geostationary"
    baseline = _fwd_points(spark, key, pts=[(-60.0, 40.0)])

    params = R.GEOS_PARAMS.pop(key)  # "fresh process": key unknown
    try:
        decoded = crs_from_grid_mapping(attrs)
        got = _fwd_points(spark, decoded, pts=[(-60.0, 40.0)])
        assert got == baseline
    finally:
        R.GEOS_PARAMS[key] = params


def test_ellipsoid_a_with_ellps_keeps_flattening():
    """'+a' alongside '+ellps' overrides the semi-major axis but keeps
    the named ellipsoid's flattening (PROJ semantics, ADVICE r7); a
    bare '+a' stays spherical."""
    from xcube_spark.operators.resampling.crsparse import _ellipsoid
    import math

    a, rf = _ellipsoid({"ellps": "GRS80", "a": "6378137"})
    assert a == 6378137.0 and abs(rf - 298.257222101) < 1e-9
    a, rf = _ellipsoid({"ellps": "GRS80", "a": "6370000"})
    assert a == 6370000.0 and abs(rf - 298.257222101) < 1e-9
    a, rf = _ellipsoid({"a": "6371000"})
    assert a == 6371000.0 and math.isinf(rf)
    a, rf = _ellipsoid({"a": "6378137", "rf": "298.25"})
    assert rf == 298.25


def test_rotated_pole_identity_and_pole_points(spark):
    """ob_tran conventions: +o_lat_p=90 +lon_0=0 is the identity; the
    grid pole maps to rotated lat 90; the true north pole maps to
    rotated lon = north_pole_grid_longitude (CF default 0) and
    rotated lat = grid_north_pole_latitude."""
    k_id = resolve_proj4("+proj=ob_tran +o_proj=longlat +o_lat_p=90 "
                         "+lon_0=0")
    got = _fwd_points(spark, k_id, pts=[(10.0, 50.0), (-120.0, -33.0)])
    assert all(r[2:] == r[:2] for r in got)  # identity rotation

    k = resolve_proj4("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 "
                      "+lon_0=18.0")  # CORDEX EUR-11: pole lon -162
    (_, _, rx, ry), = _fwd_points(spark, k, pts=[(-162.0, 39.25)])
    assert abs(ry - 90.0) < 1e-5  # asin near 1: ~sqrt(ulp) noise
    (_, _, rx, ry), = _fwd_points(spark, k, pts=[(0.0, 90.0)])
    assert abs(rx - 0.0) < 1e-9 and abs(ry - 39.25) < 1e-9

    k7 = resolve_proj4("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 "
                       "+lon_0=18.0 +o_lon_p=7.0")
    (_, _, rx, ry), = _fwd_points(spark, k7, pts=[(0.0, 90.0)])
    assert abs(rx - 7.0) < 1e-9 and abs(ry - 39.25) < 1e-9


def test_rotated_pole_eur11_control_point_and_roundtrip(spark):
    """EUR-11 rotation of (10E, 50N): value pinned by two independent
    formulations (rotation-matrix Column math vs the COSMO
    published formulas, which agree to 1e-12; rotated lon shifted 180
    per the CF north_pole_grid_longitude convention).  Round trip
    restores the input."""
    from xcube_spark.operators.resampling.reproject import get_transform

    k = resolve_proj4("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 "
                      "+lon_0=18.0")
    (_, _, rx, ry), = _fwd_points(spark, k, pts=[(10.0, 50.0)])
    assert abs(rx - -5.132644799516186) < 1e-9
    assert abs(ry - -0.4724280878272969) < 1e-9

    import pyspark.sql.functions as F
    inv = get_transform(k, "EPSG:4326")
    df = spark.createDataFrame(
        [(rx, ry)], "x double, y double")
    lon, lat = inv(F.col("x"), F.col("y"))
    (blon, blat), = [(r[0], r[1]) for r in df.select(lon, lat).collect()]
    assert abs(blon - 10.0) < 1e-9 and abs(blat - 50.0) < 1e-9


def test_rotated_pole_angular_distance_invariant(spark):
    """A pure rotation preserves great-circle angular distances."""
    import math

    k = resolve_proj4("+proj=ob_tran +o_proj=longlat +o_lat_p=52.0 "
                      "+lon_0=-25.0 +o_lon_p=3.0")
    pts = [(10.0, 50.0), (-120.0, -33.0), (77.7, 8.2), (179.0, 66.0)]
    rot = {(lon, lat): (x, y)
           for (lon, lat, x, y) in _fwd_points(spark, k, pts=pts)}

    def ang(p, q):
        l1, f1, l2, f2 = map(math.radians, (*p, *q))
        return math.acos(
            min(1.0, max(-1.0, math.sin(f1) * math.sin(f2)
                         + math.cos(f1) * math.cos(f2)
                         * math.cos(l1 - l2))))

    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a = ang(pts[i], pts[j])
            b = ang(rot[pts[i]], rot[pts[j]])
            assert abs(a - b) < 1e-12, (pts[i], pts[j])


def test_rotated_pole_cf_encode_decode_roundtrip(spark):
    """zarrio CF encode for a registered ob_tran key decodes back to a
    numerically identical transform, with and without the epsg_code
    hint."""
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    k = resolve_proj4("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 "
                      "+lon_0=18.0 +o_lon_p=0.0")
    attrs = cf_grid_mapping_attrs(k)
    assert attrs["grid_mapping_name"] == "rotated_latitude_longitude"
    assert attrs["grid_north_pole_latitude"] == 39.25
    assert attrs["grid_north_pole_longitude"] == -162.0
    assert crs_from_grid_mapping(attrs) == k
    attrs.pop("epsg_code")
    decoded = crs_from_grid_mapping(attrs)
    _assert_same_transform(spark, decoded, k,
                           pts=[(10.0, 50.0), (-30.0, 62.5)])


def test_rotated_pole_query_grid_edge_margins():
    """Every cube_reproject_rotated_pole target center must map clear
    of the 1-degree source-cell edges (floor-boundary flake guard)."""
    import numpy as np

    from xcube_spark.queries.resampling_ops import _RP, _ROTPOLE_CRS
    from xcube_spark.operators.resampling.reproject import ROTPOLE_PARAMS

    theta_p, lam_p, phi0 = ROTPOLE_PARAMS[_ROTPOLE_CRS]
    sp = np.sin(np.radians(theta_p)); cp = np.cos(np.radians(theta_p))
    xs = _RP.x_start + (np.arange(_RP.width) + 0.5) * _RP.x_res
    ys = _RP.y_start + (np.arange(_RP.height) + 0.5) * _RP.y_res
    X, Y = np.meshgrid(xs, ys)
    lam0 = np.radians(X - phi0 + 180.0); phi = np.radians(Y)
    x2 = np.cos(phi) * np.cos(lam0); y2 = np.cos(phi) * np.sin(lam0)
    z2 = np.sin(phi)
    lat = np.degrees(np.arcsin(z2 * sp - x2 * cp))
    lon = lam_p + np.degrees(np.arctan2(y2, x2 * sp + z2 * cp))
    lon = np.where(lon < -180, lon + 360,
                   np.where(lon > 180, lon - 360, lon))
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1e-6
    assert np.minimum(fy, 1 - fy).min() > 1e-6


def test_sterea_rdnew_epsg_test_point(spark):
    """EPSG Guidance Note 7-2 published test point for method 9809 on
    RD New: 53N 6E -> E 196105.283, N 557057.739 (mm-exact); the
    natural origin maps to the false origin."""
    pts = [(6.0, 53.0), (5.387638888888889, 52.156160555555555)]
    got = {(lon, lat): (x, y)
           for (lon, lat, x, y) in _fwd_points(spark, "EPSG:28992", pts)}
    e, n = got[(6.0, 53.0)]
    assert abs(e - 196105.283) < 1e-2 and abs(n - 557057.739) < 1e-2
    e, n = got[pts[1]]
    assert abs(e - 155000.0) < 1e-6 and abs(n - 463000.0) < 1e-6


def test_sterea_roundtrip(spark):
    """Forward-then-inverse restores lon/lat to <1e-9 deg across the
    RD valid region (4 conformal-latitude iterations)."""
    import pyspark.sql.functions as F
    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    pts = [(3.3, 50.8), (7.2, 53.5), (5.4, 52.2), (4.9, 51.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", "EPSG:28992")
    inv = get_transform("EPSG:28992", "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                            "E", "N")
    df = apply_transform_df(df, inv, F.col("E"), F.col("N"),
                            "blon", "blat")
    for r in df.collect():
        assert abs(r.blon - r.lon) < 1e-9 and abs(r.blat - r.lat) < 1e-9


def test_sterea_proj4_and_cf_roundtrip(spark):
    """The RD New PROJ.4 string normalizes to EPSG:28992; zarrio's CF
    encode (oblique_stereographic, pyproj's name for method 9809)
    decodes back to the same transform without the epsg hint."""
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    k = resolve_proj4(
        "+proj=sterea +lat_0=52.156160555555555 "
        "+lon_0=5.387638888888889 +k=0.9999079 +x_0=155000 "
        "+y_0=463000 +ellps=bessel")
    assert k == "EPSG:28992"
    attrs = cf_grid_mapping_attrs("EPSG:28992")
    assert attrs["grid_mapping_name"] == "oblique_stereographic"
    assert crs_from_grid_mapping(attrs) == "EPSG:28992"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:28992"
    # a different origin registers as a fresh family member
    k2 = resolve_proj4("+proj=sterea +lat_0=46.0 +lon_0=7.0 "
                       "+k=0.99 +x_0=600000 +y_0=200000 +ellps=bessel")
    assert k2.startswith("PROJ:STEREA:")
    _assert_same_transform(spark, k2, k2, pts=[(7.5, 46.5)])


def test_sterea_query_grid_edge_margins():
    """Every cube_reproject_rdnew target center must map clear of the
    1-degree source-cell edges (floor-boundary flake guard)."""
    import math

    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        _STEREA_ITERS, _sterea_consts)
    from xcube_spark.queries.resampling_ops import _RD

    c = _sterea_consts("EPSG:28992")
    xs = _RD.x_start + (np.arange(_RD.width) + 0.5) * _RD.x_res
    ys = _RD.y_start + (np.arange(_RD.height) + 0.5) * _RD.y_res
    X, Y = np.meshgrid(xs, ys)
    ep, np_ = X - c["fe"], Y - c["fn"]
    i = np.arctan2(ep, c["h"] + np_)
    j = np.arctan2(ep, c["g"] - np_) - i
    chi = c["chi0"] + 2 * np.arctan(
        (np_ - ep * np.tan(j / 2)) / c["rk2"])
    lon = np.degrees((j + 2 * i) / c["n"]) + c["lon0"]
    psi = np.log((1 + np.sin(chi))
                 / (c["c"] * (1 - np.sin(chi)))) / (2 * c["n"])
    phi = 2 * np.arctan(np.exp(psi)) - math.pi / 2
    for _ in range(_STEREA_ITERS):
        sphi = np.sin(phi)
        psii = np.log(np.tan(phi / 2 + math.pi / 4)
                      * ((1 - c["e"] * sphi)
                         / (1 + c["e"] * sphi)) ** (c["e"] / 2))
        phi = phi - (psii - psi) * np.cos(phi) \
            * (1 - c["es"] * sphi * sphi) / (1 - c["es"])
    lat = np.degrees(phi)
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1e-4
    assert np.minimum(fy, 1 - fy).min() > 1e-4


def test_cea_ease2_published_extent_and_equal_area(spark):
    """EPSG:6933 (EASE-Grid 2.0): x(180, 0) reproduces the published
    ±17367530.445161 m constant; the map rectangle's area equals the
    WGS84 ellipsoid's authalic surface (the equal-area property)."""
    import math

    from xcube_spark.operators.resampling.reproject import _cea_consts

    got = {(lon, lat): (x, y) for (lon, lat, x, y) in _fwd_points(
        spark, "EPSG:6933", [(180.0, 0.0), (0.0, 0.0), (10.0, 45.0)])}
    x, y = got[(180.0, 0.0)]
    assert abs(x - 17367530.445161372) < 1e-3 and y == 0.0
    assert got[(0.0, 0.0)] == (0.0, 0.0)

    c = _cea_consts("EPSG:6933")
    width = 2.0 * c["a"] * c["k0"] * math.pi
    height = c["a"] * c["qp"] / c["k0"]
    assert abs(width * height - 2.0 * math.pi * c["a"] ** 2 * c["qp"]) < 1.0


def test_cea_roundtrip_and_proj4_cf(spark):
    """cea round-trips <1e-7 deg; the EASE-2 PROJ.4 string normalizes
    to EPSG:6933; CF lambert_cylindrical_equal_area decodes to the
    same transform."""
    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    pts = [(-170.0, -80.0), (0.0, 0.0), (45.0, 30.0), (170.0, 80.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", "EPSG:6933")
    inv = get_transform("EPSG:6933", "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"), "rlon", "rlat")
    for r in df.collect():
        assert abs(r.rlon - r.lon) < 1e-7 and abs(r.rlat - r.lat) < 1e-7

    assert resolve_proj4(
        "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84"
    ) == "EPSG:6933"
    assert resolve_proj4(
        "+proj=cea +lat_ts=0 +datum=WGS84") == "ESRI:54034"
    attrs = cf_grid_mapping_attrs("EPSG:6933")
    assert attrs["grid_mapping_name"] == "lambert_cylindrical_equal_area"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:6933"
    # a spherical cea registers as a fresh family member and round-trips
    ks = resolve_proj4("+proj=cea +lat_ts=15 +R=6371000")
    assert ks.startswith("PROJ:CEA:")
    _assert_same_transform(spark, ks, ks, pts=[(12.0, 48.0)])


def test_lcc_1sp_tangent_cone(spark):
    """The 1-SP LCC (single +lat_1, k_0=1) is the tangent cone —
    n = sin(phi1); it must round-trip and agree with the 2-SP family
    as lat_2 -> lat_1 (continuity at the coincident-parallel limit);
    non-unit k_0 is rejected."""
    import pyspark.sql.functions as F
    import pytest

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    k1 = resolve_proj4("+proj=lcc +lat_1=46 +lat_0=46 +lon_0=3 "
                       "+x_0=700000 +y_0=660000 +ellps=GRS80")
    pts = [(3.0, 46.0), (-1.5, 48.1), (6.2, 43.4)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", k1)
    inv = get_transform(k1, "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"), "rlon", "rlat")
    for r in df.collect():
        assert abs(r.rlon - r.lon) < 1e-9 and abs(r.rlat - r.lat) < 1e-9

    # continuity: 2-SP with parallels 1e-6 deg apart matches to < 1 mm
    k2 = resolve_proj4("+proj=lcc +lat_1=45.9999995 +lat_2=46.0000005 "
                       "+lat_0=46 +lon_0=3 +x_0=700000 +y_0=660000 "
                       "+ellps=GRS80")
    a = _fwd_points(spark, k1, pts=pts)
    b = _fwd_points(spark, k2, pts=pts)
    for (lo, la, x1, y1), (_, _, x2, y2) in zip(a, b):
        assert abs(x1 - x2) < 1e-3 and abs(y1 - y2) < 1e-3, (lo, la)

    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=lcc +lat_1=46 +k_0=0.99 +ellps=GRS80")
    # CF single-standard-parallel spelling resolves too
    kcf = crs_from_cf({
        "grid_mapping_name": "lambert_conformal_conic",
        "standard_parallel": 46.0,
        "latitude_of_projection_origin": 46.0,
        "longitude_of_central_meridian": 3.0,
        "false_easting": 700_000.0, "false_northing": 660_000.0,
        "semi_major_axis": 6_378_137.0,
        "inverse_flattening": 298.257222101,
    })
    _assert_same_transform(spark, kcf, k1, pts=pts)


def test_ease2_query_grid_edge_margins():
    """Every cube_reproject_ease2 target center must map clear of the
    1-degree source-cell edges (floor-boundary flake guard)."""
    import numpy as np

    from xcube_spark.operators.resampling.reproject import _cea_consts
    from xcube_spark.queries.resampling_ops import _EASE2

    c = _cea_consts("EPSG:6933")
    xs = _EASE2.x_start + (np.arange(_EASE2.width) + 0.5) * _EASE2.x_res
    ys = _EASE2.y_start + (np.arange(_EASE2.height) + 0.5) * _EASE2.y_res
    X, Y = np.meshgrid(xs, ys)
    lon = np.degrees(X / (c["a"] * c["k0"]))
    beta = np.arcsin(Y * 2 * c["k0"] / c["a"] / c["qp"])
    s = c["series"]
    lat = np.degrees(beta + s[0] * np.sin(2 * beta)
                     + s[1] * np.sin(4 * beta)
                     + s[2] * np.sin(6 * beta))
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1e-4
    assert np.minimum(fy, 1 - fy).min() > 1e-4


def test_aeqd_center_distance_true(spark):
    """Azimuthal equidistant: the map distance from the center equals
    the great-circle distance (the projection's defining property);
    the center maps to the origin; round trip restores input."""
    import math

    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    k = resolve_proj4("+proj=aeqd +lat_0=48.3 +lon_0=11.6 +R=6371000")
    pts = [(11.6, 48.3), (2.35, 48.85), (-74.0, 40.7), (151.2, -33.9)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", k)
    inv = get_transform(k, "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"),
                            "rlon", "rlat")
    got = {(r.lon, r.lat): r for r in df.collect()}
    r0 = got[(11.6, 48.3)]
    assert abs(r0.x) < 1e-6 and abs(r0.y) < 1e-6

    def gc(lon, lat):
        l1, f1 = math.radians(11.6), math.radians(48.3)
        l2, f2 = math.radians(lon), math.radians(lat)
        return 6371000.0 * math.acos(
            min(1.0, math.sin(f1) * math.sin(f2)
                + math.cos(f1) * math.cos(f2) * math.cos(l1 - l2)))

    for lon, lat in pts[1:]:
        r = got[(lon, lat)]
        assert abs(math.hypot(r.x, r.y) - gc(lon, lat)) < 1e-3
        assert abs(r.rlon - lon) < 1e-9 and abs(r.rlat - lat) < 1e-9


def test_ortho_visibility_and_roundtrip(spark):
    """Orthographic: far-hemisphere points are NaN, near-hemisphere
    round-trips; the disk edge is at rho = R."""
    import math

    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    k = resolve_proj4("+proj=ortho +lat_0=30 +lon_0=-100 +R=6371000")
    pts = [(-100.0, 30.0), (-90.0, 40.0), (80.0, -30.0)]  # last: far side
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", k)
    inv = get_transform(k, "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"),
                            "rlon", "rlat")
    got = {(r.lon, r.lat): r for r in df.collect()}
    assert math.isnan(got[(80.0, -30.0)].x)
    r = got[(-90.0, 40.0)]
    assert abs(r.rlon - -90.0) < 1e-9 and abs(r.rlat - 40.0) < 1e-9
    assert math.hypot(r.x, r.y) < 6371000.0


def test_eqc_epsg4088_and_cf_encode(spark):
    """EPSG:4088 (World Equidistant Cylindrical, GRS80 authalic
    sphere): x = R*radians(lon), y = R*radians(lat) exactly; the
    PROJ.4 spelling normalizes to the code; aeqd/ortho CF attrs
    round-trip through zarrio."""
    import math

    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    (got,) = _fwd_points(spark, "EPSG:4088", pts=[(90.0, 45.0)])
    assert abs(got[2] - 6371007.0 * math.pi / 2.0) < 1e-6
    assert abs(got[3] - 6371007.0 * math.pi / 4.0) < 1e-6
    assert resolve_proj4("+proj=eqc +R=6371007") == "EPSG:4088"

    k = resolve_proj4("+proj=aeqd +lat_0=48.3 +lon_0=11.6 +R=6371000")
    attrs = cf_grid_mapping_attrs(k)
    assert attrs["grid_mapping_name"] == "azimuthal_equidistant"
    attrs.pop("epsg_code")
    _assert_same_transform(spark, crs_from_grid_mapping(attrs), k,
                           pts=[(2.35, 48.85)])
    ko = resolve_proj4("+proj=ortho +lat_0=30 +lon_0=-100 +R=6371000")
    attrs = cf_grid_mapping_attrs(ko)
    assert attrs["grid_mapping_name"] == "orthographic"
    attrs.pop("epsg_code")
    _assert_same_transform(spark, crs_from_grid_mapping(attrs), ko,
                           pts=[(-90.0, 40.0)])
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=aeqd +lat_0=48 +ellps=WGS84")  # ellipsoidal
    # ellipsoidal eqc (method 1028) is SUPPORTED since later round 8
    assert resolve_proj4("+proj=eqc +ellps=WGS84") == "EPSG:4087"


def test_aeqd_query_grid_edge_margins():
    """Every cube_reproject_aeqd target center must map clear of the
    1-degree source-cell edges (floor-boundary flake guard)."""
    import math

    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        AEQD_PARAMS)
    from xcube_spark.queries.resampling_ops import _AEQD, _AEQD_CRS

    r0, lat0, lon0, fe, fn = AEQD_PARAMS[_AEQD_CRS]
    sp0 = math.sin(math.radians(lat0))
    cp0 = math.cos(math.radians(lat0))
    xs = _AEQD.x_start + (np.arange(_AEQD.width) + 0.5) * _AEQD.x_res
    ys = _AEQD.y_start + (np.arange(_AEQD.height) + 0.5) * _AEQD.y_res
    X, Y = np.meshgrid(xs, ys)
    rho = np.sqrt(X * X + Y * Y)
    c = rho / r0
    lat = np.degrees(np.arcsin(np.cos(c) * sp0
                               + Y * np.sin(c) * cp0 / rho))
    lon = lon0 + np.degrees(np.arctan2(
        X * np.sin(c), rho * cp0 * np.cos(c) - Y * sp0 * np.sin(c)))
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1e-4
    assert np.minimum(fy, 1 - fy).min() > 1e-4


def test_eqc_ellipsoidal_meridian_arc(spark):
    """EPSG:4087 (ellipsoidal eqc, method 1028): y is the meridian
    arc — y(90) equals the quarter meridian (WGS84: 10001965.729 m,
    a published geodetic constant); x = a*radians(lon); round trip
    <1e-9 deg."""
    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    got = {(lon, lat): (x, y) for (lon, lat, x, y) in _fwd_points(
        spark, "EPSG:4087", [(90.0, 90.0), (45.0, 45.0)])}
    x, y = got[(90.0, 90.0)]
    assert abs(y - 10_001_965.729) < 1e-2  # quarter meridian
    import math
    assert abs(x - 6_378_137.0 * math.pi / 2.0) < 1e-6
    # y(45) is NOT R*radians(45): the arc is shorter than the sphere's
    x45, y45 = got[(45.0, 45.0)]
    assert abs(y45 - 4_984_944.378) < 1.0  # published WGS84 M(45)

    pts = [(-120.0, -67.5), (0.0, 0.0), (60.0, 33.3), (170.0, 80.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", "EPSG:4087")
    inv = get_transform("EPSG:4087", "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"),
                            "rlon", "rlat")
    for r in df.collect():
        # 3rd-order Krueger truncation: ~1.5e-9 deg (sub-mm)
        assert abs(r.rlon - r.lon) < 1e-8 and abs(r.rlat - r.lat) < 1e-8


def test_merc_k0_form_restates_as_lat_ts(spark):
    """Mercator variant A (+k_0) resolves through the closed-form
    m(lat_ts)=k0 solve: x = a*k0*radians(lon) to sub-micrometre, and
    the k_0=1 spelling lands exactly on the EPSG:3395 family."""
    import math

    k = resolve_proj4("+proj=merc +k_0=0.9996 +lon_0=0 +ellps=WGS84")
    (got,) = _fwd_points(spark, k, pts=[(10.0, 0.0)])
    assert abs(got[2] - 6_378_137.0 * 0.9996 * math.radians(10.0)) < 1e-6
    k1 = resolve_proj4("+proj=merc +k_0=1.0 +lon_0=0 +ellps=WGS84")
    _assert_same_transform(spark, k1, "EPSG:3395", pts=[(12.0, 48.0)])
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=merc +k_0=1.1 +ellps=WGS84")
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=merc +k_0=0.9 +lat_ts=30 +ellps=WGS84")
    # CF scale-factor spelling goes through the same solve
    kcf = crs_from_cf({"grid_mapping_name": "mercator",
                       "scale_factor_at_projection_origin": 0.9996,
                       "longitude_of_projection_origin": 0.0,
                       "semi_major_axis": 6_378_137.0,
                       "inverse_flattening": 298.257223563})
    _assert_same_transform(spark, kcf, k, pts=[(10.0, 0.0), (3.0, 46.5)])


def test_stereg_spherical_any_aspect(spark):
    """Spherical stereographic (Snyder ch. 21): conformal circles —
    the projection of a point at angular distance c from the center
    sits at rho = 2*R*k0*tan(c/2); oblique aspect round-trips; the CF
    'stereographic' name with earth_radius decodes onto it."""
    import math

    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    k = resolve_proj4("+proj=stere +lat_0=40 +lon_0=-30 +k_0=0.994 "
                      "+R=6370997")
    pts = [(-30.0, 40.0), (10.0, 55.0), (-80.0, 10.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", k)
    inv = get_transform(k, "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"),
                            "rlon", "rlat")
    got = {(r.lon, r.lat): r for r in df.collect()}
    assert abs(got[(-30.0, 40.0)].x) < 1e-6
    for lon, lat in pts[1:]:
        r = got[(lon, lat)]
        l1, f1 = math.radians(-30.0), math.radians(40.0)
        l2, f2 = math.radians(lon), math.radians(lat)
        c = math.acos(math.sin(f1) * math.sin(f2)
                      + math.cos(f1) * math.cos(f2) * math.cos(l1 - l2))
        rho = 2.0 * 6370997.0 * 0.994 * math.tan(c / 2.0)
        assert abs(math.hypot(r.x, r.y) - rho) < 1e-3, (lon, lat)
        assert abs(r.rlon - lon) < 1e-9 and abs(r.rlat - lat) < 1e-9

    attrs = cf_grid_mapping_attrs(k)
    assert attrs["grid_mapping_name"] == "stereographic"
    attrs.pop("epsg_code")
    _assert_same_transform(spark, crs_from_grid_mapping(attrs), k,
                           pts=pts[1:])


def test_omerc_epsg_worked_example(spark):
    """EPSG GN7-2 Hotine variant B worked example (Timbalai 1948 /
    RSO Borneo, EPSG:29873): the published test point maps mm-exact;
    the projection center maps to the false origin; round trip
    <1e-9 deg; proj4 +omerc resolves to the same transform."""
    lat_t = 5 + 23 / 60 + 14.1129 / 3600
    lon_t = 115 + 48 / 60 + 19.8196 / 3600
    got = {(lon, lat): (x, y) for (lon, lat, x, y) in _fwd_points(
        spark, "EPSG:29873", [(lon_t, lat_t), (115.0, 4.0)])}
    e, n = got[(lon_t, lat_t)]
    assert abs(e - 679245.73) < 1e-2 and abs(n - 596562.78) < 1e-2
    e, n = got[(115.0, 4.0)]
    assert abs(e - 590476.87) < 1e-6 and abs(n - 442857.65) < 1e-6

    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    pts = [(lon_t, lat_t), (112.5, 1.2), (118.0, 6.9)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", "EPSG:29873")
    inv = get_transform("EPSG:29873", "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"),
                            "rlon", "rlat")
    for r in df.collect():
        assert abs(r.rlon - r.lon) < 1e-9 and abs(r.rlat - r.lat) < 1e-9

    key = resolve_proj4(
        "+proj=omerc +lat_0=4 +lonc=115 "
        "+alpha=53.31582047222222 +gamma=53.13010236111111 "
        "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 "
        "+a=6377298.556 +rf=300.8017")
    _assert_same_transform(spark, key, key, pts=pts)
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=omerc +lat_1=1 +lon_1=2 +lat_2=3 "
                      "+lon_2=4 +ellps=WGS84")  # two-point form


def test_omerc_cf_roundtrip_and_margins(spark):
    """CF oblique_mercator encode/decode round-trips EPSG:29873; the
    cube_reproject_omerc window keeps >= 1e-3 deg floor margins."""
    import math

    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        OMERC_PARAMS, _omerc_consts)
    from xcube_spark.queries.resampling_ops import _RSO
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    attrs = cf_grid_mapping_attrs("EPSG:29873")
    assert attrs["grid_mapping_name"] == "oblique_mercator"
    attrs.pop("epsg_code")
    _assert_same_transform(spark, crs_from_grid_mapping(attrs),
                           "EPSG:29873", pts=[(115.5, 4.5)])

    c = _omerc_consts("EPSG:29873")
    xs = _RSO.x_start + (np.arange(_RSO.width) + 0.5) * _RSO.x_res
    ys = _RSO.y_start + (np.arange(_RSO.height) + 0.5) * _RSO.y_res
    X, Y = np.meshgrid(xs, ys)
    vv = (X - c["ec"]) * c["cg"] - (Y - c["nc"]) * c["sg"]
    uu = (Y - c["nc"]) * c["cg"] + (X - c["ec"]) * c["sg"] + c["uoff"]
    q = np.exp(-c["b"] * vv / c["big_a"])
    s = (q - 1 / q) / 2
    t = (q + 1 / q) / 2
    bu = c["b"] * uu / c["big_a"]
    u = (np.sin(bu) * c["cg0"] + s * c["sg0"]) / t
    tt = (c["h"] / np.sqrt((1 + u) / (1 - u))) ** (1 / c["b"])
    chi = math.pi / 2 - 2 * np.arctan(tt)
    phi = chi
    for j, cf in enumerate(c["series"], start=1):
        phi = phi + cf * np.sin(2 * j * chi)
    lat = np.degrees(phi)
    lon = np.degrees(c["lam0"] - np.arctan2(
        s * c["cg0"] - np.sin(bu) * c["sg0"], np.cos(bu)) / c["b"])
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1e-3
    assert np.minimum(fy, 1 - fy).min() > 1e-3


def test_conics_on_non_grs80_ellipsoids(spark):
    """LCC/AEA/LAEA accept arbitrary ellipsoids (round 8): the
    Clarke 1866 LCC reproduces Snyder's Appendix worked example
    (SP 33/45, origin 23N/96W, point 35N/75W -> 1894410.9,
    1564649.5); origins map to the false origin; all three
    round-trip; and the GRS80 spellings still resolve to the legacy
    short-tuple keys."""
    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    k_lcc = resolve_proj4("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 "
                          "+lon_0=-96 +ellps=clrk66")
    got = {(lon, lat): (x, y) for (lon, lat, x, y) in _fwd_points(
        spark, k_lcc, [(-75.0, 35.0), (-96.0, 23.0)])}
    x, y = got[(-75.0, 35.0)]
    assert abs(x - 1894410.9) < 0.1 and abs(y - 1564649.5) < 0.1
    assert got[(-96.0, 23.0)] == (0.0, 0.0)

    cases = [
        k_lcc,
        resolve_proj4("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 "
                      "+lon_0=-96 +ellps=clrk66"),
        resolve_proj4("+proj=laea +lat_0=45 +lon_0=-100 "
                      "+ellps=intl"),
        resolve_proj4("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 "
                      "+lon_0=-95 +ellps=krass"),
    ]
    pts = [(-110.0, 30.0), (-96.0, 40.0), (-80.0, 55.0)]
    for key in cases:
        assert "6378137.0" not in key or "KRASS" in key
        df = spark.createDataFrame(pts, "lon double, lat double")
        fwd = get_transform("EPSG:4326", key)
        inv = get_transform(key, "EPSG:4326")
        df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                                "x", "y")
        df = apply_transform_df(df, inv, F.col("x"), F.col("y"),
                                "rlon", "rlat")
        for r in df.collect():
            # beta/chi series are 3rd/4th-order in e^2: Clarke 1866's
            # larger eccentricity leaves ~1.2e-8 deg (~1.4 mm)
            assert abs(r.rlon - r.lon) < 5e-8, key
            assert abs(r.rlat - r.lat) < 5e-8, key

    # GRS80 spellings keep the legacy short keys (unchanged doubles)
    k = resolve_proj4("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 "
                      "+lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80")
    assert k.count(",") == 5  # six params, no ellipsoid extension
    _assert_same_transform(spark, k, "EPSG:2154", pts=[(3.0, 46.5)])
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=laea +lat_0=45 +R=6371000")  # spherical


def test_conics_non_grs80_cf_roundtrip(spark):
    """CF encode of an ellipsoid-extended conic records the actual
    (a, rf) and decodes back to the same transform."""
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    k = resolve_proj4("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 "
                      "+lon_0=-96 +ellps=clrk66")
    attrs = cf_grid_mapping_attrs(k)
    assert attrs["semi_major_axis"] == 6378206.4
    assert attrs["inverse_flattening"] == 294.978698214
    attrs.pop("epsg_code")
    _assert_same_transform(spark, crs_from_grid_mapping(attrs), k,
                           pts=[(-96.0, 35.0), (-110.0, 41.0)])


def test_nsper_vertical_perspective(spark):
    """Near-sided perspective (Snyder ch. 23): rho = R(P-1)sin(c) /
    (P-cos(c)) (the defining property); beyond-horizon points are
    NaN; h -> large approaches orthographic; round trip; CF
    vertical_perspective decodes onto it."""
    import math

    import pyspark.sql.functions as F

    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    R0, h = 6371000.0, 35786000.0
    k = resolve_proj4(f"+proj=nsper +h={h} +lat_0=0 +lon_0=-60 "
                      f"+R={R0}")
    P = 1.0 + h / R0
    pts = [(-60.0, 0.0), (-30.0, 25.0), (120.0, 0.0)]  # last: far side
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", k)
    inv = get_transform(k, "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    df = apply_transform_df(df, inv, F.col("x"), F.col("y"),
                            "rlon", "rlat")
    got = {(r.lon, r.lat): r for r in df.collect()}
    assert got[(-60.0, 0.0)].x == 0.0 and got[(-60.0, 0.0)].y == 0.0
    assert math.isnan(got[(120.0, 0.0)].x)
    r = got[(-30.0, 25.0)]
    c = math.acos(math.cos(math.radians(25.0))
                  * math.cos(math.radians(30.0)))
    rho = R0 * (P - 1.0) * math.sin(c) / (P - math.cos(c))
    assert abs(math.hypot(r.x, r.y) - rho) < 1e-3
    assert abs(r.rlon - -30.0) < 1e-9 and abs(r.rlat - 25.0) < 1e-9

    # h -> very large: converges to orthographic (sub-metre at 1e12 m)
    k_inf = resolve_proj4(f"+proj=nsper +h=1e12 +lat_0=0 +lon_0=-60 "
                          f"+R={R0}")
    k_ortho = resolve_proj4(f"+proj=ortho +lat_0=0 +lon_0=-60 +R={R0}")
    a = _fwd_points(spark, k_inf, pts=[(-30.0, 25.0)])
    b = _fwd_points(spark, k_ortho, pts=[(-30.0, 25.0)])
    # convergence is first-order in 1/P: ~(1-cos c)/P * rho ~ 2.5 m
    assert abs(a[0][2] - b[0][2]) < 5.0 and abs(a[0][3] - b[0][3]) < 5.0

    attrs = cf_grid_mapping_attrs(k)
    assert attrs["grid_mapping_name"] == "vertical_perspective"
    attrs.pop("epsg_code")
    _assert_same_transform(spark, crs_from_grid_mapping(attrs), k,
                           pts=[(-30.0, 25.0)])


def test_somerc_swisstopo_worked_example(spark):
    """swisstopo's published worked example for the Swiss projection
    incl. the WGS84 datum change: WGS84 8°43'49.79"E 46°02'38.87"N ->
    LV03 E 700000 / N 100000 (angles quoted to 0.01" ~ 0.3 m); LV95
    is the same projection with the +2,000,000/+1,000,000 offsets.
    The BARE (datum-less) family maps the Bern origin exactly to its
    false easting/northing."""
    lon = 8.0 + 43.0 / 60.0 + 49.79 / 3600.0
    lat = 46.0 + 2.0 / 60.0 + 38.87 / 3600.0
    (_, _, e03, n03), = _fwd_points(spark, "EPSG:21781", [(lon, lat)])
    assert abs(e03 - 700_000.0) < 0.5 and abs(n03 - 100_000.0) < 0.5
    (_, _, e95, n95), = _fwd_points(spark, "EPSG:2056", [(lon, lat)])
    assert abs(e95 - (e03 + 2_000_000.0)) < 1e-6
    assert abs(n95 - (n03 + 1_000_000.0)) < 1e-6
    # datum-less somerc: origin -> (FE, FN) exactly
    bare = resolve_proj4(
        "+proj=somerc +lat_0=46.95240555555556 "
        "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 +y_0=200000 "
        "+ellps=bessel")
    assert bare.startswith("PROJ:SOMERC:")
    (_, _, e, n), = _fwd_points(
        spark, bare, [(7.439583333333333, 46.95240555555556)])
    assert abs(e - 600_000.0) < 1e-6 and abs(n - 200_000.0) < 1e-5


def test_somerc_roundtrip(spark):
    """Forward-then-inverse restores WGS84 lon/lat to <2e-8 deg (~2 mm)
    across Switzerland (4 isometric-latitude iterations + the Helmert
    hop each way, single-shot Bowring closing the loop)."""
    import pyspark.sql.functions as F
    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)

    pts = [(6.1, 45.9), (7.44, 46.95), (8.55, 47.37), (10.4, 46.5)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", "EPSG:2056")
    inv = get_transform("EPSG:2056", "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                            "E", "N")
    df = apply_transform_df(df, inv, F.col("E"), F.col("N"),
                            "blon", "blat")
    for r in df.collect():
        assert abs(r.blon - r.lon) < 2e-8 and abs(r.blat - r.lat) < 2e-8


def test_somerc_proj4_and_cf_roundtrip(spark):
    """The LV03/LV95 PROJ.4 strings (incl. +towgs84) normalize to
    their EPSG codes; zarrio's CF encode (swiss_oblique_cylindrical +
    towgs84) decodes back to the same key; a 3-param towgs84 equals
    the 7-param zero-rotation spelling; bare somerc (no towgs84)
    registers a DIFFERENT family member."""
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    s = ("+proj=somerc +lat_0=46.95240555555556 "
         "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 "
         "+ellps=bessel +towgs84=674.374,15.056,405.346")
    assert resolve_proj4(s) == "EPSG:2056"
    s7 = s.replace("405.346", "405.346,0,0,0,0")
    assert resolve_proj4(s7) == "EPSG:2056"
    assert resolve_proj4(s.replace("2600000", "600000")
                         .replace("1200000", "200000")) == "EPSG:21781"
    bare = resolve_proj4(s.rsplit(" +towgs84", 1)[0])
    assert bare.startswith("PROJ:SOMERC:")
    attrs = cf_grid_mapping_attrs("EPSG:2056")
    assert attrs["grid_mapping_name"] == "swiss_oblique_cylindrical"
    assert attrs["towgs84"][:3] == [674.374, 15.056, 405.346]
    assert crs_from_grid_mapping(attrs) == "EPSG:2056"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:2056"


def test_somerc_query_grid_edge_margins():
    """Every cube_reproject_lv95 target center must map clear of the
    1-degree source-cell edges (floor-boundary flake guard) — numpy
    twin of the staged inverse incl. the datum hop."""
    import math

    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        _SOMERC_ITERS, _WGS_A, _WGS_B, _WGS_E2, _WGS_EP2,
        _somerc_consts)
    from xcube_spark.queries.resampling_ops import _LV95

    c = _somerc_consts("EPSG:2056")
    xs = _LV95.x_start + (np.arange(_LV95.width) + 0.5) * _LV95.x_res
    ys = _LV95.y_start + (np.arange(_LV95.height) + 0.5) * _LV95.y_res
    X, Y = np.meshgrid(xs, ys)
    lb = (X - c["fe"]) / c["big_r"]
    bb = 2.0 * np.arctan(np.exp((Y - c["fn"]) / c["big_r"])) \
        - math.pi / 2.0
    b = np.arcsin(c["cb0"] * np.sin(bb)
                  + c["sb0"] * np.cos(bb) * np.cos(lb))
    lam = c["lam0"] + np.arctan2(
        np.cos(bb) * np.sin(lb),
        c["cb0"] * np.cos(bb) * np.cos(lb)
        - c["sb0"] * np.sin(bb)) / c["alpha"]
    psit = (np.log(np.tan(math.pi / 4.0 + b / 2.0)) - c["k"]) \
        / c["alpha"]
    phi = 2.0 * np.arctan(np.exp(psit)) - math.pi / 2.0
    e, es = c["e"], c["es"]
    for _ in range(_SOMERC_ITERS):
        sphi = np.sin(phi)
        psii = (np.log(np.tan(phi / 2.0 + math.pi / 4.0))
                - e / 2.0 * np.log((1.0 + e * sphi) / (1.0 - e * sphi)))
        phi = phi - (psii - psit) * np.cos(phi) \
            * (1.0 - es * sphi * sphi) / (1.0 - es)
    nu = c["a"] / np.sqrt(1.0 - es * np.sin(phi) ** 2)
    Xl = nu * np.cos(phi) * np.cos(lam)
    Yl = nu * np.cos(phi) * np.sin(lam)
    Zl = nu * (1.0 - es) * np.sin(phi)
    tx, ty, tz = c["towgs84"][:3]
    Xw, Yw, Zw = Xl + tx, Yl + ty, Zl + tz
    p = np.sqrt(Xw * Xw + Yw * Yw)
    th = np.arctan2(Zw * _WGS_A, p * _WGS_B)
    lat = np.degrees(np.arctan2(
        Zw + _WGS_EP2 * _WGS_B * np.sin(th) ** 3,
        p - _WGS_E2 * _WGS_A * np.cos(th) ** 3))
    lon = np.degrees(np.arctan2(Yw, Xw))
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 4e-4
    assert np.minimum(fy, 1 - fy).min() > 4e-4


def test_krovak_gn72_worked_example(spark):
    """EPSG GN7-2 published worked example for method 9819 on the
    datum-less Krovak family: 50°12'32.4416"N 16°50'59.1790"E
    (Greenwich, S-JTSK geodetic) -> southing 1050538.63 / westing
    568991.00, i.e. E -568991.00 / N -1050538.63 in the East-North
    axis convention (<2 cm)."""
    lon = 16.0 + 50.0 / 60.0 + 59.1790 / 3600.0
    lat = 50.0 + 12.0 / 60.0 + 32.4416 / 3600.0
    bare = resolve_proj4("+proj=krovak +ellps=bessel")
    assert bare.startswith("PROJ:KROVAK:")
    (_, _, e, n), = _fwd_points(spark, bare, [(lon, lat)])
    assert abs(e - -568_991.00) < 0.02 and abs(n - -1_050_538.63) < 0.02
    # +czech flips to positive southing/westing (EPSG:2065 convention)
    czech = resolve_proj4("+proj=krovak +ellps=bessel +czech")
    (_, _, e2, n2), = _fwd_points(spark, czech, [(lon, lat)])
    assert abs(e2 - 568_991.00) < 0.02 and abs(n2 - 1_050_538.63) < 0.02


def test_krovak_roundtrip_and_proj4_cf(spark):
    """EPSG:5514 (with the published towgs84 hop) round-trips WGS84
    lon/lat to <2e-8 deg across Czechia/Slovakia; the full PROJ.4
    string normalizes to EPSG:5514; zarrio's CF encode (GDAL's
    'krovak' spelling + towgs84) decodes back to the same key."""
    import pyspark.sql.functions as F
    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    pts = [(12.4, 48.6), (14.42076, 50.08804), (17.107, 48.148),
           (18.2, 49.2)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = get_transform("EPSG:4326", "EPSG:5514")
    inv = get_transform("EPSG:5514", "EPSG:4326")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                            "E", "N")
    df = apply_transform_df(df, inv, F.col("E"), F.col("N"),
                            "blon", "blat")
    for r in df.collect():
        assert r.E < 0 and r.N < 0  # East-North axes are negative
        assert abs(r.blon - r.lon) < 2e-8 and abs(r.blat - r.lat) < 2e-8

    s = ("+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
         "+alpha=30.288139749999997 +lat_1=78.5 +k=0.9999 "
         "+x_0=0 +y_0=0 +ellps=bessel +towgs84=589,76,480")
    assert resolve_proj4(s) == "EPSG:5514"
    attrs = cf_grid_mapping_attrs("EPSG:5514")
    assert attrs["grid_mapping_name"] == "krovak"
    assert attrs["towgs84"][:3] == [589.0, 76.0, 480.0]
    assert crs_from_grid_mapping(attrs) == "EPSG:5514"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:5514"


def test_krovak_query_grid_edge_margins():
    """Every cube_reproject_krovak target center must map clear of
    the 1-degree source-cell edges (floor-boundary flake guard) —
    numpy twin of the staged inverse incl. the datum hop."""
    import math

    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        _KROVAK_ITERS, _WGS_A, _WGS_B, _WGS_E2, _WGS_EP2,
        _krovak_consts)
    from xcube_spark.queries.resampling_ops import _KROVAK

    c = _krovak_consts("EPSG:5514")
    xs = _KROVAK.x_start + (np.arange(_KROVAK.width) + 0.5) * _KROVAK.x_res
    ys = _KROVAK.y_start + (np.arange(_KROVAK.height) + 0.5) * _KROVAK.y_res
    X, Y = np.meshgrid(xs, ys)
    sth = c["sgn"] * (Y - c["y0"])
    wst = c["sgn"] * (X - c["x0"])
    r = np.sqrt(sth * sth + wst * wst)
    D = np.arctan2(wst, sth) / c["n"]
    T = 2.0 * (np.arctan((c["r0"] / r) ** (1.0 / c["n"]) * c["tp"])
               - math.pi / 4.0)
    U = np.arcsin(c["ca"] * np.sin(T) - c["sa"] * np.cos(T) * np.cos(D))
    lam = c["lam0"] - np.arcsin(np.cos(T) * np.sin(D) / np.cos(U)) \
        / c["b"]
    e, es, b = c["e"], c["es"], c["b"]
    phi = U.copy()
    for _ in range(_KROVAK_ITERS):
        s = np.sin(phi)
        phi = 2.0 * (np.arctan(
            c["t0"] ** (-1.0 / b)
            * np.tan(U / 2.0 + math.pi / 4.0) ** (1.0 / b)
            * ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2.0))
            - math.pi / 4.0)
    nu = c["a"] / np.sqrt(1.0 - es * np.sin(phi) ** 2)
    Xl = nu * np.cos(phi) * np.cos(lam)
    Yl = nu * np.cos(phi) * np.sin(lam)
    Zl = nu * (1.0 - es) * np.sin(phi)
    tx, ty, tz = c["towgs84"][:3]
    Xw, Yw, Zw = Xl + tx, Yl + ty, Zl + tz
    p = np.sqrt(Xw * Xw + Yw * Yw)
    th = np.arctan2(Zw * _WGS_A, p * _WGS_B)
    lat = np.degrees(np.arctan2(
        Zw + _WGS_EP2 * _WGS_B * np.sin(th) ** 3,
        p - _WGS_E2 * _WGS_A * np.cos(th) ** 3))
    lon = np.degrees(np.arctan2(Yw, Xw))
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 5e-4
    assert np.minimum(fy, 1 - fy).min() > 5e-4


def test_eqearth_equal_area_and_proj4_cf(spark):
    """EPSG:8857: the projected area of a graticule cell equals its
    area on the WGS84 authalic sphere (the defining property, checked
    on a 10-degree band via the x-scale x boundary integral); the
    PROJ.4 string normalizes to EPSG:8857; zarrio's CF encode
    (equal_earth) decodes back; a spherical +R form registers its
    own family member and round-trips."""
    import math

    from xcube_spark.operators.resampling.reproject import (
        _eqearth_consts)
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    # area between lat1..lat2, lon width W deg = W/360 * 2*pi*Rq^2
    # * (sin b2 - sin b1) must equal the projected trapezoid area
    # integral; sample with a fine Riemann sum over the y axis
    c = _eqearth_consts("EPSG:8857")
    pts = [(10.0 * k, 0.0) for k in range(5)]
    fwd = get_transform("EPSG:4326", "EPSG:8857")
    import numpy as np
    lats = np.linspace(10.0, 50.0, 2001)
    df = spark.createDataFrame([(float(v),) for v in lats],
                               "lat double")
    import pyspark.sql.functions as F
    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df)
    out = apply_transform_df(df, fwd, F.lit(10.0), F.col("lat"),
                             "x", "y")
    rows = sorted(out.collect(), key=lambda r: r.lat)
    xs = np.array([r.x for r in rows])
    ys = np.array([r.y for r in rows])
    # strip 0..10E between lat 10..50: integral of x dy (x at lon 10
    # is 10/180 of the half-width at that y)
    proj_area = np.trapz(xs, ys)
    es, e = c["es"], c["e"]

    def q_auth(phi):
        s = math.sin(phi)
        return (1 - es) * (s / (1 - es * s * s)
                           - 1 / (2 * e)
                           * math.log((1 - e * s) / (1 + e * s)))

    b1 = math.asin(q_auth(math.radians(10.0)) / c["qp"])
    b2 = math.asin(q_auth(math.radians(50.0)) / c["qp"])
    true_area = (10.0 / 360.0) * 2 * math.pi * c["rq"] ** 2 \
        * (math.sin(b2) - math.sin(b1))
    assert abs(proj_area - true_area) / true_area < 1e-6

    assert resolve_proj4("+proj=eqearth +ellps=WGS84") == "EPSG:8857"
    attrs = cf_grid_mapping_attrs("EPSG:8857")
    assert attrs["grid_mapping_name"] == "equal_earth"
    assert crs_from_grid_mapping(attrs) == "EPSG:8857"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:8857"
    sph = resolve_proj4("+proj=eqearth +R=6371007.0")
    assert sph.startswith("PROJ:EQEARTH:")
    _assert_same_transform(spark, sph, sph, pts=[(30.0, 40.0)])


def test_eqearth_query_grid_edge_margins():
    """Every cube_reproject_eqearth target center must map clear of
    the 1-degree source-cell edges (floor-boundary flake guard) —
    numpy twin of the staged inverse."""
    import math

    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        _EQE_A1, _EQE_A2, _EQE_A3, _EQE_A4, _EQE_ITERS, _EQE_M,
        _eqearth_consts)
    from xcube_spark.queries.resampling_ops import _EQE

    c = _eqearth_consts("EPSG:8857")
    xs = _EQE.x_start + (np.arange(_EQE.width) + 0.5) * _EQE.x_res
    ys = _EQE.y_start + (np.arange(_EQE.height) + 0.5) * _EQE.y_res
    X, Y = np.meshgrid(xs, ys)

    def h(t):
        return t * (_EQE_A1 + _EQE_A2 * t * t) \
            + t ** 7 * (_EQE_A3 + _EQE_A4 * t * t)

    def hp(t):
        return _EQE_A1 + 3.0 * _EQE_A2 * t * t \
            + t ** 6 * (7.0 * _EQE_A3 + 9.0 * _EQE_A4 * t * t)

    yn = (Y - c["fn"]) / c["rq"]
    th = yn / _EQE_A1
    for _ in range(_EQE_ITERS):
        th = th - (h(th) - yn) / hp(th)
    beta = np.arcsin(np.sin(th) / _EQE_M)
    lat = np.degrees(beta + c["c2"] * np.sin(2 * beta)
                     + c["c4"] * np.sin(4 * beta)
                     + c["c6"] * np.sin(6 * beta))
    lon = c["lon0"] + np.degrees(
        (X - c["fe"]) * hp(th) * _EQE_M / (c["rq"] * np.cos(th)))
    assert np.abs(lon).max() < 179.9  # inscribed in the outline
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 9e-4
    assert np.minimum(fy, 1 - fy).min() > 9e-4


def test_cass_trinidad_gn72_worked_example(spark):
    """EPSG GN7-2 published worked example for method 9806 on
    Trinidad 1903: 10°N 62°W -> E 66644.94 / N 82536.22 Clarke's
    links (sub-link); the natural origin maps to the false origin;
    PROJ.4 string normalizes to EPSG:30200; zarrio's CF encode
    (cassini_soldner) decodes back to the same key."""
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    pts = [(-62.0, 10.0),
           (-(61.0 + 20.0 / 60.0), 10.0 + 26.0 / 60.0 + 30.0 / 3600.0)]
    got = {(lon, lat): (x, y)
           for (lon, lat, x, y) in _fwd_points(spark, "EPSG:30200", pts)}
    e, n = got[pts[0]]
    assert abs(e - 66_644.94) < 0.01 and abs(n - 82_536.22) < 0.01
    e, n = got[pts[1]]
    assert abs(e - 430_000.0) < 1e-6 and abs(n - 325_000.0) < 1e-6
    k = resolve_proj4(
        "+proj=cass +lat_0=10.441666666666666 "
        "+lon_0=-61.333333333333336 +x_0=430000 +y_0=325000 "
        "+a=31706587.88 +rf=294.260676369")
    assert k == "EPSG:30200"
    attrs = cf_grid_mapping_attrs("EPSG:30200")
    assert attrs["grid_mapping_name"] == "cassini_soldner"
    assert crs_from_grid_mapping(attrs) == "EPSG:30200"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:30200"


def test_cass_query_grid_edge_margins():
    """Every cube_reproject_trinidad target center must map clear of
    the 1-degree source-cell edges — numpy twin of the inverse."""
    import math

    import numpy as np

    from xcube_spark.operators.resampling.reproject import _cass_consts
    from xcube_spark.queries.resampling_ops import _TRIN

    c = _cass_consts("EPSG:30200")
    a, es = c["a"], c["es"]
    xs = _TRIN.x_start + (np.arange(_TRIN.width) + 0.5) * _TRIN.x_res
    ys = _TRIN.y_start + (np.arange(_TRIN.height) + 0.5) * _TRIN.y_res
    X, Y = np.meshgrid(xs, ys)
    mu = (c["m0"] + (Y - c["fn"])) / (a * c["m_c0"])
    phi1 = mu + c["f1_2"] * np.sin(2 * mu) + c["f1_4"] * np.sin(4 * mu) \
        + c["f1_6"] * np.sin(6 * mu)
    t1 = np.tan(phi1) ** 2
    nu1 = a / np.sqrt(1 - es * np.sin(phi1) ** 2)
    rho1 = a * (1 - es) / (1 - es * np.sin(phi1) ** 2) ** 1.5
    d = (X - c["fe"]) / nu1
    lat = np.degrees(phi1 - (nu1 * np.tan(phi1) / rho1)
                     * (d * d / 2 - (1 + 3 * t1) * d ** 4 / 24))
    lon = np.degrees(c["lam0"] + (d - t1 * d ** 3 / 3
                                  + (1 + 3 * t1) * t1 * d ** 5 / 15)
                     / np.cos(phi1))
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1e-2
    assert np.minimum(fy, 1 - fy).min() > 1e-2


def test_poly_snyder_worked_example_and_equator_guard(spark):
    """Snyder's Clarke-1866 polyconic worked example (40N 75W ->
    1776774.5 / 1319657.8, 0.1 m); the equator row (degenerate cone)
    takes the guarded tangent-cylinder form on BOTH directions;
    PROJ.4/CF round-trips for EPSG:29101."""
    import pyspark.sql.functions as F
    from xcube_spark.operators.resampling.reproject import (
        apply_transform_df, get_transform)
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    k = resolve_proj4("+proj=poly +lat_0=30 +lon_0=-96 "
                      "+a=6378206.4 +rf=294.97870821")
    (_, _, x, y), = _fwd_points(spark, k, [(-75.0, 40.0)])
    assert abs(x - 1_776_774.5) < 0.15 and abs(y - 1_319_657.8) < 0.15

    # equator row: forward is a(lam-lam0), inverse restores it
    fwd = get_transform("EPSG:4326", "EPSG:29101")
    inv = get_transform("EPSG:29101", "EPSG:4326")
    df = spark.createDataFrame([(-54.0, 0.0), (-50.0, 0.0)],
                               "lon double, lat double")
    df = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                            "E", "N")
    df = apply_transform_df(df, inv, F.col("E"), F.col("N"),
                            "blon", "blat")
    got = {r.lon: r for r in df.collect()}
    assert abs(got[-54.0].E - 5_000_000.0) < 1e-6
    assert abs(got[-54.0].N - 10_000_000.0) < 1e-6
    for r in got.values():
        assert abs(r.blon - r.lon) < 1e-9 and abs(r.blat - r.lat) < 1e-9

    assert resolve_proj4(
        "+proj=poly +lat_0=0 +lon_0=-54 +x_0=5000000 +y_0=10000000 "
        "+a=6378160 +rf=298.25") == "EPSG:29101"
    attrs = cf_grid_mapping_attrs("EPSG:29101")
    assert attrs["grid_mapping_name"] == "polyconic"
    assert crs_from_grid_mapping(attrs) == "EPSG:29101"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:29101"


def test_poly_query_grid_edge_margins():
    """Every cube_reproject_brazil_poly target center must map clear
    of the 1-degree source-cell edges — numpy twin of the staged
    Snyder 18-18 inverse."""
    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        _POLY_ITERS, _poly_consts)
    from xcube_spark.queries.resampling_ops import _BRPOLY

    c = _poly_consts("EPSG:29101")
    a, es = c["a"], c["es"]
    xs = _BRPOLY.x_start + (np.arange(_BRPOLY.width) + 0.5) \
        * _BRPOLY.x_res
    ys = _BRPOLY.y_start + (np.arange(_BRPOLY.height) + 0.5) \
        * _BRPOLY.y_res
    X, Y = np.meshgrid(xs, ys)
    A = (c["m0"] + (Y - c["fn"])) / a
    xa = (X - c["fe"]) / a
    B = A * A + xa * xa
    phi = A.copy()
    for _ in range(_POLY_ITERS):
        s2 = np.sin(2 * phi)
        C = np.sqrt(1 - es * np.sin(phi) ** 2) * np.tan(phi)
        Ma = (c["c0"] * phi - c["c2"] * np.sin(2 * phi)
              + c["c4"] * np.sin(4 * phi) - c["c6"] * np.sin(6 * phi))
        Mp = (c["c0"] - 2 * c["c2"] * np.cos(2 * phi)
              + 4 * c["c4"] * np.cos(4 * phi)
              - 6 * c["c6"] * np.cos(6 * phi))
        num = A * (C * Ma + 1) - Ma - 0.5 * C * (Ma * Ma + B)
        den = es * s2 * (Ma * Ma + B - 2 * A * Ma) / (4 * C) \
            + (A - Ma) * (C * Mp - 2 / s2) - Mp
        phi = phi - num / den
    lat = np.degrees(phi)
    lon = np.degrees(c["lam0"] + np.arcsin(
        xa * np.sqrt(1 - es * np.sin(phi) ** 2) * np.tan(phi))
        / np.sin(phi))
    assert lat.max() < -0.5  # grid stays off the equator guard row
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 4e-4
    assert np.minimum(fy, 1 - fy).min() > 4e-4


def test_ups_variant_a_worked_example_and_matching(spark):
    """EPSG GN7-2 method-9810 variant-A worked example (73N 44E ->
    E 3320416.75 / N 632668.43 on UPS North); PROJ.4 +k_0 / CF
    scale-factor forms match the fixed EPSG codes; the generic
    registered key is numerically identical to EPSG:5041."""
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    (_, _, x, y), = _fwd_points(spark, "EPSG:5041", [(44.0, 73.0)])
    assert abs(x - 3_320_416.75) < 0.01
    assert abs(y - 632_668.43) < 0.01

    assert resolve_proj4(
        "+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 "
        "+datum=WGS84") == "EPSG:5041"
    assert resolve_proj4(
        "+proj=stere +lat_0=-90 +k_0=0.994 +x_0=2000000 "
        "+y_0=2000000 +ellps=WGS84") == "EPSG:5042"
    # lat_ts=90 is the pole: also variant A (k0 defaults to 1)
    assert resolve_proj4(
        "+proj=stere +lat_0=90 +lat_ts=90 +k=0.994 +x_0=2000000 "
        "+y_0=2000000 +datum=WGS84") == "EPSG:5041"
    # the new variant-B fixed codes
    assert resolve_proj4(
        "+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 "
        "+datum=WGS84") == "EPSG:3976"
    assert resolve_proj4(
        "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=0 "
        "+datum=WGS84") == "EPSG:3995"

    # a generic variant-A registration transforms identically when
    # its parameters equal the EPSG set
    key = resolve_proj4(
        "+proj=stere +lat_0=90 +k=0.994 +x_0=2000000.5 "
        "+y_0=2000000 +datum=WGS84")
    assert key.startswith("PROJ:STERE:")
    pts = [(44.0, 73.0), (-120.0, 85.0)]
    a = _fwd_points(spark, "EPSG:5041", pts)
    b = _fwd_points(spark, key, pts)
    for (_, _, xa, ya), (_, _, xb, yb) in zip(a, b):
        assert abs((xb - 0.5) - xa) < 1e-6 and yb == ya

    # CF round trip carries the scale-factor form
    attrs = cf_grid_mapping_attrs("EPSG:5041")
    assert attrs["scale_factor_at_projection_origin"] == 0.994
    assert crs_from_grid_mapping(attrs) == "EPSG:5041"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "EPSG:5041"

    with pytest.raises(NotImplementedError, match="ambiguous"):
        resolve_proj4("+proj=stere +lat_0=90 +lat_ts=70 +k=0.97 "
                      "+datum=WGS84")
    with pytest.raises(NotImplementedError, match=r"\(0, 1\]"):
        resolve_proj4("+proj=stere +lat_0=90 +k=1.2 +datum=WGS84")


def test_ups_query_grid_edge_margins():
    """Every cube_reproject_ups target center must map clear of the
    1-degree source-cell edges — numpy twin of the variant-A
    inverse.  The 40x40 window spans ~30 deg of lon so the best
    achievable min margin is ~1e-3 deg; that is still ~1e9 x the
    cross-engine libm spread."""
    import numpy as np

    from xcube_spark.operators.resampling.reproject import (
        _PS_SERIES, _ps_unpack)
    from xcube_spark.queries.resampling_ops import _UPS

    c = _ps_unpack("EPSG:5041")
    xs = _UPS.x_start + (np.arange(_UPS.width) + 0.5) * _UPS.x_res
    ys = _UPS.y_start + (np.arange(_UPS.height) + 0.5) * _UPS.y_res
    X, Y = np.meshgrid(xs, ys)
    x = X - c["fe"]
    y = Y - c["fn"]
    rho = np.sqrt(x * x + y * y)
    t = rho * c["Kinv"]
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    phi = chi
    for j, cj in enumerate(_PS_SERIES, start=1):
        phi = phi + cj * np.sin(2.0 * j * chi)
    lat = np.degrees(phi)
    lon = np.degrees(np.arctan2(x, -y))
    assert lat.min() > 70.0 and lat.max() < 89.0
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1e-3
    assert np.minimum(fy, 1 - fy).min() > 1e-3


def test_eck4_equal_area_and_proj4_cf(spark):
    """ESRI:54012 Eckert IV: the projected area of a 10-degree strip
    equals its spherical area (the defining equal-area property,
    checked via the x-by-y boundary integral); the pole line is half
    the equator length; PROJ.4 +proj=eck4 on the WGS84 semimajor
    normalizes to ESRI:54012; zarrio's CF extension (eckert_iv)
    decodes back; a spherical +R form registers its own family
    member."""
    import math

    import numpy as np

    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    R = 6378137.0
    fwd = get_transform("EPSG:4326", "ESRI:54012")
    lats = np.linspace(10.0, 50.0, 2001)
    df = spark.createDataFrame([(float(v),) for v in lats],
                               "lat double")
    out = apply_transform_df(df, fwd, F.lit(10.0), F.col("lat"),
                             "x", "y")
    rows = sorted(out.collect(), key=lambda r: r.lat)
    xs = np.array([r.x for r in rows])
    ys = np.array([r.y for r in rows])
    proj_area = np.trapz(xs, ys)
    true_area = (10.0 / 360.0) * 2 * math.pi * R * R \
        * (math.sin(math.radians(50.0)) - math.sin(math.radians(10.0)))
    assert abs(proj_area - true_area) / true_area < 1e-6

    # pole line is exactly half the equator length
    eq = _fwd_points(spark, "ESRI:54012", pts=[(180.0, 0.0),
                                               (180.0, 90.0)])
    x_eq = eq[0][2]
    x_pole = eq[1][2]
    assert abs(x_pole - x_eq / 2.0) < 1e-6

    assert resolve_proj4("+proj=eck4 +a=6378137 +b=6378137") == \
        "ESRI:54012"
    attrs = cf_grid_mapping_attrs("ESRI:54012")
    assert attrs["grid_mapping_name"] == "eckert_iv"
    assert crs_from_grid_mapping(attrs) == "ESRI:54012"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "ESRI:54012"
    sph = resolve_proj4("+proj=eck4 +R=6371007.0")
    assert sph.startswith("PROJ:ECK4:")
    _assert_same_transform(spark, sph, sph, pts=[(30.0, 40.0)])


def test_mill_compressed_mercator_identity(spark):
    """ESRI:54003 Miller: y_mill(phi) = 1.25 * y_merc(0.8 * phi) on
    the same sphere — the Snyder ch. 11 definition, asserted against
    the (independent) spherical-Mercator family; PROJ.4 +proj=mill
    normalizes to ESRI:54003; CF extension round-trips."""
    import math

    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    lats = [-80.0, -45.0, -10.0, 0.0, 25.0, 60.0, 85.0]
    mill = _fwd_points(spark, "ESRI:54003",
                       pts=[(20.0, v) for v in lats])
    R = 6378137.0
    for (_, lat, px, py) in mill:
        y_merc = R * math.log(math.tan(
            math.pi / 4.0 + 0.8 * math.radians(lat) / 2.0))
        assert abs(py - 1.25 * y_merc) < 1e-6 * max(1.0, abs(py)), lat
        assert abs(px - R * math.radians(20.0)) < 1e-6

    assert resolve_proj4("+proj=mill +a=6378137 +b=6378137") == \
        "ESRI:54003"
    attrs = cf_grid_mapping_attrs("ESRI:54003")
    assert attrs["grid_mapping_name"] == "miller_cylindrical"
    assert crs_from_grid_mapping(attrs) == "ESRI:54003"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "ESRI:54003"


def test_vandg_snyder_construction(spark):
    """ESRI:54029 Van der Grinten I: the Column forward must match
    an independent numpy statement of Snyder 33-1..33-13 on a
    lon/lat grid; structural anchors (linear equator, poles at
    (0, +-pi R), boundary circle) hold; PROJ.4 + CF round-trip."""
    import math

    import numpy as np

    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    R = 6378137.0
    pts = [(lon, lat)
           for lon in (-150.0, -75.0, -10.0, 35.0, 120.0, 179.0)
           for lat in (-80.0, -35.0, -5.0, 15.0, 55.0, 85.0)]
    got = _fwd_points(spark, "ESRI:54029", pts=pts)

    def snyder(lon, lat):
        lam = math.radians(lon)
        phi = math.radians(lat)
        theta = math.asin(abs(2.0 * phi / math.pi))
        A = 0.5 * abs(math.pi / lam - lam / math.pi)
        G = math.cos(theta) / (math.sin(theta) + math.cos(theta)
                               - 1.0)
        P = G * (2.0 / math.sin(theta) - 1.0)
        Q = A * A + G
        x = math.copysign(math.pi * R, lam) * (
            A * (G - P * P) + math.sqrt(
                A * A * (G - P * P) ** 2
                - (P * P + A * A) * (G * G - P * P))
        ) / (P * P + A * A)
        y = math.copysign(math.pi * R, phi) * (
            P * Q - A * math.sqrt(
                (A * A + 1.0) * (P * P + A * A) - Q * Q)
        ) / (P * P + A * A)
        return x, y

    for (lon, lat, px, py) in got:
        ex, ey = snyder(lon, lat)
        assert abs(px - ex) < 1e-5, (lon, lat)
        assert abs(py - ey) < 1e-5, (lon, lat)
        # inside (or on) the boundary circle of radius pi R
        assert math.hypot(px, py) <= math.pi * R * (1 + 1e-12)

    anchors = _fwd_points(spark, "ESRI:54029",
                          pts=[(180.0, 0.0), (90.0, 0.0),
                               (0.0, 90.0), (0.0, -90.0)])
    by = {(a[0], a[1]): (a[2], a[3]) for a in anchors}
    pr = math.pi * R
    assert abs(by[(180.0, 0.0)][0] - pr) < 1e-6
    assert abs(by[(90.0, 0.0)][0] - pr / 2.0) < 1e-6
    assert abs(by[(0.0, 90.0)][1] - pr) < 1e-5
    assert abs(by[(0.0, -90.0)][1] + pr) < 1e-5

    assert resolve_proj4("+proj=vandg +a=6378137 +b=6378137") == \
        "ESRI:54029"
    attrs = cf_grid_mapping_attrs("ESRI:54029")
    assert attrs["grid_mapping_name"] == "van_der_grinten"
    assert crs_from_grid_mapping(attrs) == "ESRI:54029"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "ESRI:54029"


def test_world_projection_query_grid_edge_margins():
    """Every cube_reproject_{eck4,miller,vandg} target center must
    map clear of the 1-degree source-cell edges (floor-boundary
    flake guard) — numpy twins of the Column inverses."""
    import math

    import numpy as np

    from xcube_spark.queries.resampling_ops import (_ECK4G, _MILLG,
                                                    _VANDGG)

    R = 6378137.0
    CX = 2.0 / math.sqrt(math.pi * (4.0 + math.pi))
    CY = 2.0 * math.sqrt(math.pi / (4.0 + math.pi))
    CP = 2.0 + math.pi / 2.0

    def centers(g):
        xs = g.x_start + (np.arange(g.width) + 0.5) * g.x_res
        ys = g.y_start + (np.arange(g.height) + 0.5) * g.y_res
        return np.meshgrid(xs, ys)

    def check(lon, lat, lim=9e-4):
        assert np.abs(lon).max() < 179.9
        assert np.abs(lat).max() < 89.9
        fx = (lon + 180.0) % 1.0
        fy = (lat + 90.0) % 1.0
        assert np.minimum(fx, 1 - fx).min() > lim
        assert np.minimum(fy, 1 - fy).min() > lim

    X, Y = centers(_ECK4G)
    t = np.arcsin(Y / (CY * R))
    lat = np.degrees(np.arcsin(
        (t + np.sin(t) * np.cos(t) + 2.0 * np.sin(t)) / CP))
    lon = np.degrees(X / (CX * R * (1.0 + np.cos(t))))
    check(lon, lat, lim=2e-3)

    X, Y = centers(_MILLG)
    lat = np.degrees(2.5 * (np.arctan(np.exp(0.8 * Y / R))
                            - math.pi / 4.0))
    lon = np.degrees(X / R)
    check(lon, lat, lim=6e-2)

    x, y = centers(_VANDGG)
    pr = math.pi * R
    Xn, Yn = x / pr, y / pr
    X2, Y2 = Xn * Xn, Yn * Yn
    c1 = -np.abs(Yn) * (1.0 + X2 + Y2)
    c2 = c1 - 2.0 * Y2 + X2
    c3 = -2.0 * c1 + 1.0 + 2.0 * Y2 + (X2 + Y2) ** 2
    d = Y2 / c3 + (2.0 * c2 ** 3 / c3 ** 3
                   - 9.0 * c1 * c2 / c3 ** 2) / 27.0
    a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
    m1 = 2.0 * np.sqrt(-a1 / 3.0)
    t1 = np.arccos(3.0 * d / (a1 * m1)) / 3.0
    lat = np.degrees(np.sign(Yn) * math.pi * (
        -m1 * np.cos(t1 + math.pi / 3.0) - c2 / (3.0 * c3)))
    lon = np.degrees(math.pi * (
        X2 + Y2 - 1.0 + np.sqrt(1.0 + 2.0 * (X2 - Y2)
                                + (X2 + Y2) ** 2)) / (2.0 * Xn))
    check(lon, lat, lim=1.4e-3)


def test_natearth_polynomial_and_proj4_cf(spark):
    """PROJ:NATEARTH: the Column forward must match an independent
    numpy statement of the Savric/Jenny/Patterson 2011 polynomials on
    a lon/lat grid; roundtrip < 1e-9 deg; PROJ.4 +proj=natearth
    normalizes to the canonical key; CF extension round-trips; a +R
    form registers its own member."""
    import math

    import numpy as np

    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
    B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
    R = 6378137.0

    def xfac(p2):
        return A[0] + p2 * (A[1] + p2 * (A[2] + p2 ** 3
                                         * (A[3] + p2 * A[4])))

    def yfac(p2):
        return B[0] + p2 * (B[1] + p2 * p2
                            * (B[2] + B[3] * p2 + B[4] * p2 * p2))

    pts = [(lon, lat)
           for lon in (-170.0, -85.0, -20.0, 40.0, 125.0, 179.0)
           for lat in (-88.0, -45.0, -10.0, 0.0, 30.0, 72.0)]
    got = _fwd_points(spark, "PROJ:NATEARTH", pts=pts)
    for (lon, lat, px, py) in got:
        phi = math.radians(lat)
        p2 = phi * phi
        assert abs(px - R * math.radians(lon) * xfac(p2)) < 1e-5, (lon, lat)
        assert abs(py - R * phi * yfac(p2)) < 1e-5, (lon, lat)

    fwd = get_transform("EPSG:4326", "PROJ:NATEARTH")
    inv = get_transform("PROJ:NATEARTH", "EPSG:4326")
    df = spark.createDataFrame(pts, "lon double, lat double")
    d = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                           "px", "py")
    d = apply_transform_df(d, inv, F.col("px"), F.col("py"),
                           "rlon", "rlat")
    for r in d.collect():
        assert abs(r.rlon - r.lon) < 1e-9
        assert abs(r.rlat - r.lat) < 1e-9

    assert resolve_proj4("+proj=natearth +a=6378137 +b=6378137") == \
        "PROJ:NATEARTH"
    attrs = cf_grid_mapping_attrs("PROJ:NATEARTH")
    assert attrs["grid_mapping_name"] == "natural_earth"
    assert crs_from_grid_mapping(attrs) == "PROJ:NATEARTH"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "PROJ:NATEARTH"
    sph = resolve_proj4("+proj=natearth +R=6371007.0")
    assert sph.startswith("PROJ:NATEARTH:")
    _assert_same_transform(spark, sph, sph, pts=[(30.0, 40.0)])


def test_natearth_query_grid_edge_margins():
    """cube_reproject_natearth floor-boundary guard — numpy twin of
    the staged inverse (same iteration count)."""
    import numpy as np

    from xcube_spark.queries.resampling_ops import _NATE

    A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
    B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
    C = (B[0], 3 * B[1], 7 * B[2], 9 * B[3], 11 * B[4])
    R = 6378137.0

    def xfac(p2):
        return A[0] + p2 * (A[1] + p2 * (A[2] + p2 ** 3
                                         * (A[3] + p2 * A[4])))

    def yfac(p2):
        return B[0] + p2 * (B[1] + p2 * p2
                            * (B[2] + B[3] * p2 + B[4] * p2 * p2))

    def dy(p2):
        return C[0] + p2 * (C[1] + p2 * p2
                            * (C[2] + C[3] * p2 + C[4] * p2 * p2))

    xs = _NATE.x_start + (np.arange(_NATE.width) + 0.5) * _NATE.x_res
    ys = _NATE.y_start + (np.arange(_NATE.height) + 0.5) * _NATE.y_res
    X, Y = np.meshgrid(xs, ys)
    yn = Y / R
    ph = yn.copy()
    for _ in range(6):
        q2 = ph * ph
        ph = ph - (ph * yfac(q2) - yn) / dy(q2)
    q2 = ph * ph
    lon = np.degrees(X / (R * xfac(q2)))
    lat = np.degrees(ph)
    assert np.abs(lon).max() < 179.9
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 2e-3
    assert np.minimum(fy, 1 - fy).min() > 2e-3


def test_gnomonic_great_circles_are_straight(spark):
    """Spherical gnomonic (Snyder ch. 22): any three points of a
    great circle must project to COLLINEAR map points — the defining
    property.  Checked for several great circles through the
    projection center's hemisphere; plus roundtrip, proj4 and CF
    resolution."""
    import math

    import numpy as np

    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    key = resolve_proj4("+proj=gnom +lat_0=40 +lon_0=-100 +R=6371000")
    assert key.startswith("PROJ:GNOM:")

    # great circle through A and B: sample 3 points by slerp
    def slerp(a, b, t):
        av = np.array([math.cos(math.radians(a[1]))
                       * math.cos(math.radians(a[0])),
                       math.cos(math.radians(a[1]))
                       * math.sin(math.radians(a[0])),
                       math.sin(math.radians(a[1]))])
        bv = np.array([math.cos(math.radians(b[1]))
                       * math.cos(math.radians(b[0])),
                       math.cos(math.radians(b[1]))
                       * math.sin(math.radians(b[0])),
                       math.sin(math.radians(b[1]))])
        om = math.acos(float(np.clip(av @ bv, -1, 1)))
        v = (math.sin((1 - t) * om) * av + math.sin(t * om) * bv) \
            / math.sin(om)
        return (math.degrees(math.atan2(v[1], v[0])),
                math.degrees(math.asin(v[2])))

    arcs = [((-130.0, 20.0), (-70.0, 55.0)),
            ((-120.0, 60.0), (-80.0, 15.0)),
            ((-140.0, 45.0), (-60.0, 40.0))]
    pts = []
    for a, b in arcs:
        pts += [slerp(a, b, t) for t in (0.15, 0.5, 0.85)]
    got = _fwd_points(spark, key, pts=pts)
    by = {(round(p[0], 9), round(p[1], 9)): (p[2], p[3]) for p in got}
    for a, b in arcs:
        tri = [by[(round(v[0], 9), round(v[1], 9))]
               for v in (slerp(a, b, 0.15), slerp(a, b, 0.5),
                         slerp(a, b, 0.85))]
        (x1, y1), (x2, y2), (x3, y3) = tri
        cross = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
        span2 = ((x3 - x1) ** 2 + (y3 - y1) ** 2)
        assert abs(cross) / span2 < 1e-6, (a, b, cross)

    # roundtrip
    fwd = get_transform("EPSG:4326", key)
    inv = get_transform(key, "EPSG:4326")
    df = spark.createDataFrame(pts, "lon double, lat double")
    d = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"),
                           "px", "py")
    d = apply_transform_df(d, inv, F.col("px"), F.col("py"),
                           "rlon", "rlat")
    for r in d.collect():
        assert abs(r.rlon - r.lon) < 1e-9
        assert abs(r.rlat - r.lat) < 1e-9

    # far hemisphere is NaN
    far = _fwd_points(spark, key, pts=[(80.0, -40.0)])
    import math as _m
    assert _m.isnan(far[0][2]) and _m.isnan(far[0][3])

    attrs = cf_grid_mapping_attrs(key)
    assert attrs["grid_mapping_name"] == "gnomonic"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == key


def test_gnomonic_query_grid_edge_margins():
    """cube_reproject_gnomonic floor-boundary guard — numpy twin."""
    import math

    import numpy as np

    from xcube_spark.queries.resampling_ops import _GNOM

    R, lat0, lon0 = 6371000.0, 40.0, -100.0
    sp0 = math.sin(math.radians(lat0))
    cp0 = math.cos(math.radians(lat0))
    xs = _GNOM.x_start + (np.arange(_GNOM.width) + 0.5) * _GNOM.x_res
    ys = _GNOM.y_start + (np.arange(_GNOM.height) + 0.5) * _GNOM.y_res
    X, Y = np.meshgrid(xs, ys)
    rho = np.sqrt(X * X + Y * Y)
    c = np.arctan(rho / R)
    lat = np.degrees(np.arcsin(np.cos(c) * sp0
                               + Y * np.sin(c) * cp0 / rho))
    lon = lon0 + np.degrees(np.arctan2(
        X * np.sin(c), rho * cp0 * np.cos(c) - Y * sp0 * np.sin(c)))
    fx = (lon + 180.0) % 1.0
    fy = (lat + 90.0) % 1.0
    assert np.minimum(fx, 1 - fx).min() > 1.5e-3
    assert np.minimum(fy, 1 - fy).min() > 1.5e-3


def test_new_family_gate_grid_margins_via_oracle_sql():
    """Gate-grid floor-boundary guard for the round-8 batch-2 families
    (3395/eqc/stereg/sinu/ortho/nsper), evaluated through the exact
    inverse-SQL twin strings the oracles use (DuckDB), so this also
    smoke-checks the twins themselves: finite everywhere on the grid,
    every center clear of the 1-degree source-cell edges."""
    import duckdb

    from xcube_spark.queries import resampling_ops as q

    cases = [
        ("3395", q._M3395, q._M3395_LON, q._M3395_LAT, 4e-4),
        ("eqc", q._EQC, q._EQC_LON, q._EQC_LAT, 4e-3),
        ("stereg", q._STEREG, q._STEREG_LON, q._STEREG_LAT, 1e-3),
        ("sinu", q._SINU, q._SINU_LON, q._SINU_LAT, 4e-4),
        ("ortho", q._ORTHO, q._ORTHO_LON, q._ORTHO_LAT, 4e-4),
        ("nsper", q._NSPER, q._NSPER_LON, q._NSPER_LAT, 5e-4),
    ]
    con = duckdb.connect()
    for name, grid, lon_sql, lat_sql, floor in cases:
        mx, my, bad = con.execute(f"""
            WITH tgt AS (
                SELECT CAST(range // {grid.width} AS INT) AS y_i,
                       CAST(range % {grid.width} AS INT) AS x_i
                FROM range({grid.width * grid.height})
            ), ll AS (
                SELECT {lon_sql} AS lon, {lat_sql} AS lat FROM tgt
            )
            SELECT min(least((lon + 180.0) % 1.0,
                             1.0 - (lon + 180.0) % 1.0)),
                   min(least((lat + 90.0) % 1.0,
                             1.0 - (lat + 90.0) % 1.0)),
                   count(*) FILTER (isnan(lon) OR isnan(lat))
            FROM ll
        """).fetchone()
        assert bad == 0, name
        assert mx > floor, (name, mx)
        assert my > floor, (name, my)


def test_eqdc_roundtrip_properties_and_cf(spark):
    """Equidistant conic (+proj=eqdc): round trips <5e-8 deg both
    sweeps; meridian scale is TRUE everywhere on the ellipsoid (the
    family's defining property — dy/dphi equals the meridian radius
    of curvature); CF encode/decode round-trips through the
    equidistant_conic extension name; gate grid clear of floor
    boundaries via the exact oracle SQL."""
    import duckdb

    from xcube_spark.operators.resampling.reproject import (
        eqdc_inverse_sql, get_transform)
    from xcube_spark.queries.resampling_ops import _EQDC, _EQDC_CRS
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    sph = resolve_proj4(
        "+proj=eqdc +lat_1=30 +lat_2=50 +lat_0=40 +lon_0=-100 "
        "+R=6371000")
    pts = [(-120.0, 35.0), (-80.0, 55.0), (-100.0, 40.0),
           (-95.5, 30.0), (-130.0, 62.5)]
    for crs in (sph, _EQDC_CRS):
        fwd = get_transform("EPSG:4326", crs)
        inv = get_transform(crs, "EPSG:4326")
        df = spark.createDataFrame(pts, "lon double, lat double")
        x, y = fwd(F.col("lon"), F.col("lat"))
        st = df.select("lon", "lat", x.alias("x"), y.alias("y"))
        lon2, lat2 = inv(F.col("x"), F.col("y"))
        for r in st.select("lon", "lat", lon2.alias("lon2"),
                           lat2.alias("lat2")).collect():
            assert abs(r.lon2 - r.lon) < 5e-8
            assert abs(r.lat2 - r.lat) < 5e-8

    # true meridian scale on the ellipsoid (1e-6 relative: series
    # truncation + finite difference)
    fwd = get_transform("EPSG:4326", _EQDC_CRS)
    df = spark.createDataFrame(
        [(-100.0, 40.0), (-100.0, 40.001)], "lon double, lat double")
    x, y = fwd(F.col("lon"), F.col("lat"))
    ys = [r.y for r in df.select(y.alias("y")).collect()]
    a, rf = 6378137.0, 298.257222101
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    s = math.sin(math.radians(40.0))
    mc = a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
    want = mc * math.radians(0.001)
    assert abs((ys[1] - ys[0]) - want) / want < 1e-6

    # CF round trip (PROJ: keys re-resolve through the CF attrs)
    attrs = cf_grid_mapping_attrs(_EQDC_CRS)
    assert attrs["grid_mapping_name"] == "equidistant_conic"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == _EQDC_CRS

    # gate-grid margin via the exact oracle twin
    lon_sql, lat_sql = eqdc_inverse_sql(
        "CAST((-2724013.0 + (x_i + 0.5) * 140017.0) AS DOUBLE)",
        "CAST((-2326011.0 + (y_i + 0.5) * 120013.0) AS DOUBLE)",
        _EQDC_CRS)
    mx, my = duckdb.connect().execute(f"""
        WITH tgt AS (SELECT CAST(range // {_EQDC.width} AS INT) AS y_i,
                            CAST(range % {_EQDC.width} AS INT) AS x_i
                     FROM range({_EQDC.width * _EQDC.height})),
        ll AS (SELECT {lon_sql} AS lon, {lat_sql} AS lat FROM tgt)
        SELECT min(least((lon+180.0)%1.0, 1.0-(lon+180.0)%1.0)),
               min(least((lat+90.0)%1.0, 1.0-(lat+90.0)%1.0)) FROM ll
    """).fetchone()
    assert mx > 5e-4 and my > 5e-4


def test_eqdc_rejections():
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=eqdc +lat_1=0 +lat_2=0 +R=6371000")
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=eqdc +lat_1=40 +lat_2=40 +ellps=GRS80")
    # coincident parallels on a SPHERE are the tangent cone (fine)
    key = resolve_proj4("+proj=eqdc +lat_1=40 +lat_2=40 +R=6371000")
    assert key.startswith("PROJ:EQDC:")


def test_robinson_roundtrip_anchors_cf_and_margins(spark):
    """Robinson (ESRI:54030): round trips at 1e-12 deg away from the
    pole clamp; the published node values are hit exactly at the
    5-degree latitudes (the spline interpolates, so nodes are exact);
    outline extents match 0.8487*R*pi / 1.3523*R; CF round-trips via
    the robinson extension name; gate grid clear of floor boundaries
    through the exact oracle CTEs."""
    import duckdb

    from xcube_spark.operators.resampling.reproject import (
        _ROBIN_X, _ROBIN_Y, get_transform, robin_inverse_sql_ctes)
    from xcube_spark.queries.resampling_ops import _ROBIN
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    r = 6378137.0
    fwd = get_transform("EPSG:4326", "ESRI:54030")
    inv = get_transform("ESRI:54030", "EPSG:4326")
    pts = [(-120.0, 35.2), (30.0, -47.6), (179.0, 84.3), (45.0, 52.5),
           (0.0, 0.0), (-180.0, 25.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    st = fwd.apply_df(df, F.col("lon"), F.col("lat"), "x", "y")
    st2 = inv.apply_df(st.select("lon", "lat", "x", "y"),
                       F.col("x"), F.col("y"), "lon2", "lat2")
    for r2 in st2.select("lon", "lat", "lon2", "lat2").collect():
        assert abs(r2.lon2 - r2.lon) < 1e-10
        assert abs(r2.lat2 - r2.lat) < 1e-10

    # node exactness: at lat = 5k the spline passes through the
    # published (X, Y) table values
    nodes = [(0.0, 5.0 * k) for k in range(0, 19, 3)]
    dfn = spark.createDataFrame(nodes, "lon double, lat double")
    stn = fwd.apply_df(dfn, F.col("lon"), F.col("lat"), "x", "y")
    for r3 in stn.select("lat", "y").collect():
        k = int(r3.lat / 5.0)
        # the pole sits on the clamped last interval edge (s is
        # nudged 2e-7 inside so floor() can't index interval 18):
        # ~0.2 m short there, exact elsewhere
        tol = 0.5 if k == 18 else 1e-6
        assert abs(r3.y - 1.3523 * r * _ROBIN_Y[k]) < tol
    # outline: x(180, 0) = 0.8487*R*pi (X(0) = 1)
    dfe = spark.createDataFrame([(180.0, 0.0)], "lon double, lat double")
    xe = fwd.apply_df(dfe, F.col("lon"), F.col("lat"), "x", "y") \
        .collect()[0].x
    assert abs(xe - 0.8487 * r * math.pi) < 1e-6
    assert _ROBIN_X[0] == 1.0

    # CF extension round trip
    attrs = cf_grid_mapping_attrs("ESRI:54030")
    assert attrs["grid_mapping_name"] == "robinson"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "ESRI:54030"
    assert resolve_proj4("+proj=robin +a=6378137") == "ESRI:54030"

    # gate-grid margins via the exact oracle CTEs
    ctes = robin_inverse_sql_ctes(
        "CAST((-10866011.0 + (x_i + 0.5) * 540017.0) AS DOUBLE)",
        "CAST((-7808013.0 + (y_i + 0.5) * 390013.0) AS DOUBLE)",
        "ESRI:54030")
    mx, my, bad = duckdb.connect().execute(f"""
        WITH tgt AS (SELECT CAST(range // {_ROBIN.width} AS INT) AS y_i,
                            CAST(range % {_ROBIN.width} AS INT) AS x_i
                     FROM range({_ROBIN.width * _ROBIN.height})),
        {ctes}
        SELECT min(least((lon+180.0)%1.0, 1.0-(lon+180.0)%1.0)),
               min(least((lat+90.0)%1.0, 1.0-(lat+90.0)%1.0)),
               count(*) FILTER (lon < -180 OR lon > 180 OR isnan(lon))
        FROM robin_ll
    """).fetchone()
    assert bad == 0
    assert mx > 1e-3 and my > 1e-3


def test_robinson_y_spline_is_monotone():
    """The Newton solve assumes Y'(s) > 0 on every interval — sample
    the derivative densely (the data is smooth and increasing, but
    pin it rather than assume it)."""
    from xcube_spark.operators.resampling.reproject import _ROBIN_YC

    for a, b, c, d in _ROBIN_YC:
        for t in range(101):
            s = t / 100.0
            assert b + 2 * c * s + 3 * d * s * s > 0.0


def test_hammer_roundtrip_equal_area_cf_and_margins(spark):
    """Hammer (PROJ:HAMMER): closed-form round trips at 1e-12 deg;
    the defining EQUAL-AREA property holds numerically (quad areas on
    the map match R^2 * cos(lat) * dlon * dlat to first order);
    outline extents 2*sqrt(2)*R x sqrt(2)*R; CF + proj4 round trips;
    gate grid margins via the exact oracle SQL."""
    import duckdb

    from xcube_spark.operators.resampling.reproject import (
        get_transform, hammer_inverse_sql)
    from xcube_spark.queries.resampling_ops import _HAMMER

    r = 6378137.0
    fwd = get_transform("EPSG:4326", "PROJ:HAMMER")
    pts = [(lon, lat) for lon in (-150.0, -60.0, 0.5, 77.0, 179.0)
           for lat in (-80.0, -33.0, 0.5, 41.0, 86.0)]
    inv = get_transform("PROJ:HAMMER", "EPSG:4326")
    df = spark.createDataFrame(pts, "lon double, lat double")
    x, y = fwd(F.col("lon"), F.col("lat"))
    st = df.select("lon", "lat", x.alias("x"), y.alias("y"))
    lon2, lat2 = inv(F.col("x"), F.col("y"))
    for r2 in st.select("lon", "lat", lon2.alias("lon2"),
                        lat2.alias("lat2")).collect():
        assert abs(r2.lon2 - r2.lon) < 1e-9
        assert abs(r2.lat2 - r2.lat) < 1e-9

    # equal-area: small quads at very different latitudes keep their
    # true-sphere area ratio (0.01-degree quads, centroid rule)
    def quad_area(lon0, lat0, d=0.01):
        quad = [(lon0, lat0), (lon0 + d, lat0),
                (lon0 + d, lat0 + d), (lon0, lat0 + d)]
        dfq = spark.createDataFrame(quad, "lon double, lat double")
        xq, yq = fwd(F.col("lon"), F.col("lat"))
        rows = dfq.select(xq.alias("x"), yq.alias("y")).collect()
        ps = [(row.x, row.y) for row in rows]
        s = 0.0
        for i in range(4):
            x1, y1 = ps[i]
            x2, y2 = ps[(i + 1) % 4]
            s += x1 * y2 - x2 * y1
        return abs(s) / 2.0
    a_eq = quad_area(10.0, 0.0)
    a_hi = quad_area(120.0, 60.0)
    want = math.cos(math.radians(60.005)) / math.cos(math.radians(0.005))
    assert abs(a_hi / a_eq - want) / want < 1e-3

    # outline: x(180, 0) = 2*sqrt(2)*R, y(0, 90) = sqrt(2)*R
    dfe = spark.createDataFrame([(180.0, 0.0), (0.0, 90.0)],
                                "lon double, lat double")
    xe, ye = fwd(F.col("lon"), F.col("lat"))
    rows = dfe.select("lon", xe.alias("x"), ye.alias("y")).collect()
    for r3 in rows:
        if r3.lon == 180.0:
            assert abs(r3.x - 2.0 * math.sqrt(2.0) * r) < 1e-6
        else:
            assert abs(r3.y - math.sqrt(2.0) * r) < 1e-6

    # proj4 + CF round trips
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)
    assert resolve_proj4("+proj=hammer +a=6378137") == "PROJ:HAMMER"
    with pytest.raises(NotImplementedError):
        resolve_proj4("+proj=hammer +W=0.25 +a=6378137")
    attrs = cf_grid_mapping_attrs("PROJ:HAMMER")
    assert attrs["grid_mapping_name"] == "hammer"
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "PROJ:HAMMER"

    # gate-grid margins via the exact oracle twin
    lon_sql, lat_sql = hammer_inverse_sql(
        "(-10500011.0 + (x_i + 0.5) * 540017.0)",
        "(-7020013.0 + (y_i + 0.5) * 360013.0)", "PROJ:HAMMER")
    mx, my, bad = duckdb.connect().execute(f"""
        WITH tgt AS (SELECT CAST(range // {_HAMMER.width} AS INT) AS y_i,
                            CAST(range % {_HAMMER.width} AS INT) AS x_i
                     FROM range({_HAMMER.width * _HAMMER.height})),
        ll AS (SELECT {lon_sql} AS lon, {lat_sql} AS lat FROM tgt)
        SELECT min(least((lon+180.0)%1.0, 1.0-(lon+180.0)%1.0)),
               min(least((lat+90.0)%1.0, 1.0-(lat+90.0)%1.0)),
               count(*) FILTER (lon < -180 OR lon > 180
                                OR isnan(lon) OR isnan(lat))
        FROM ll
    """).fetchone()
    assert bad == 0
    assert mx > 4e-4 and my > 4e-4


def test_wintri_roundtrip_anchors_cf_and_margins(spark):
    """Winkel Tripel (ESRI:54042, round 9): the 6-step analytic-
    Jacobian Newton inverse round trips at 1e-10 deg across the world;
    the defining anchors hold (equator x = R/2 lam (cos phi1 + 1)
    exactly, central meridian y = R/2 (phi + phi/sinc) with the pole
    at y = R pi/2, boundary x(180, 0) = R pi/2 (2/pi + 1)); CF
    round-trips via the winkel_tripel extension name with the
    standard_parallel; gate grid clear of floor boundaries through
    the exact oracle CTEs."""
    import duckdb

    from xcube_spark.operators.resampling.reproject import (
        get_transform, wintri_inverse_sql_ctes)
    from xcube_spark.queries.resampling_ops import _WINTRI
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    r = 6378137.0
    cp1 = 2.0 / math.pi
    fwd = get_transform("EPSG:4326", "ESRI:54042")
    inv = get_transform("ESRI:54042", "EPSG:4326")
    pts = [(-120.0, 35.2), (30.0, -47.6), (179.0, 84.3), (45.0, 52.5),
           (0.5, 0.5), (-179.5, 25.0), (120.0, -89.0), (0.0, 89.5)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    st = df.select("lon", "lat",
                   *(c.alias(n) for c, n in
                     zip(fwd(F.col("lon"), F.col("lat")), ("x", "y"))))
    st2 = inv.apply_df(st, F.col("x"), F.col("y"), "lon2", "lat2")
    for r2 in st2.select("lon", "lat", "lon2", "lat2").collect():
        assert abs(r2.lon2 - r2.lon) < 1e-10
        assert abs(r2.lat2 - r2.lat) < 1e-10

    # anchors (exact closed forms of the forward)
    anchors = spark.createDataFrame(
        [(90.0, 0.0), (180.0, 0.0), (0.0, 90.0)],
        "lon double, lat double")
    got = {(a.lon, a.lat): (a.x, a.y) for a in anchors.select(
        "lon", "lat",
        *(c.alias(n) for c, n in
          zip(fwd(F.col("lon"), F.col("lat")), ("x", "y")))).collect()}
    lam = math.pi / 2
    alpha = math.acos(math.cos(lam / 2))
    t = alpha / math.sin(alpha)
    assert abs(got[(90.0, 0.0)][0]
               - 0.5 * r * (lam * cp1 + 2 * math.sin(lam / 2) * t)) < 1e-6
    assert abs(got[(90.0, 0.0)][1]) < 1e-6
    # boundary: alpha(180, 0) = pi/2, T = pi/2 -> x = R pi/2 (cp1 + 1)
    assert abs(got[(180.0, 0.0)][0]
               - r * math.pi / 2 * (cp1 + 1.0)) < 1e-6
    # pole: y = R/2 (pi/2 + 1 * (pi/2)/1) = R pi/2
    assert abs(got[(0.0, 90.0)][1] - r * math.pi / 2) < 1e-6

    # CF extension round trip (standard_parallel = acos(2/pi) deg)
    attrs = cf_grid_mapping_attrs("ESRI:54042")
    assert attrs["grid_mapping_name"] == "winkel_tripel"
    assert abs(attrs["standard_parallel"]
               - math.degrees(math.acos(cp1))) < 1e-9
    attrs.pop("epsg_code")
    assert crs_from_grid_mapping(attrs) == "ESRI:54042"
    assert resolve_proj4("+proj=wintri +a=6378137") == "ESRI:54042"

    # gate-grid margins via the exact oracle CTEs
    ctes = wintri_inverse_sql_ctes(
        "CAST((-10869011.0 + (x_i + 0.5) * 540017.0) AS DOUBLE)",
        "CAST((-7799013.0 + (y_i + 0.5) * 390313.0) AS DOUBLE)",
        "ESRI:54042")
    mx, my, bad = duckdb.connect().execute(f"""
        WITH tgt AS (SELECT CAST(range // {_WINTRI.width} AS INT) AS y_i,
                            CAST(range % {_WINTRI.width} AS INT) AS x_i
                     FROM range({_WINTRI.width * _WINTRI.height})),
        {ctes}
        SELECT min(least((lon+180.0)%1.0, 1.0-(lon+180.0)%1.0)),
               min(least((lat+90.0)%1.0, 1.0-(lat+90.0)%1.0)),
               count(*) FILTER (lon < -180 OR lon > 180 OR isnan(lon))
        FROM wintri_ll
    """).fetchone()
    assert bad == 0
    assert mx > 8e-4 and my > 1e-3


def test_goode_homolosine_roundtrip_interruption_cf_and_margins(spark):
    """Interrupted Goode homolosine (PROJ:IGH, round 9 — the r8
    verdict's designated 'interrupted projections' gap): the closed-
    form inverse round trips the staged forward at 1e-10 deg across
    every lobe; the fusion is EXACTLY continuous at the 40d44'11.8"
    boundary parallel (the continuity offset is solved at import, not
    quoted); the interruption at 40W splits adjacent meridians into
    different lobes (x jumps by thousands of km); sinusoidal anchors
    hold on the lobe central meridians; CF round-trips via the
    interrupted_goode_homolosine extension name; the gate grid keeps
    >= 1.5e-3 deg margins through the exact oracle SQL."""
    import duckdb

    from xcube_spark.operators.resampling.reproject import (
        _IGH_DY, _IGH_PHIB, apply_transform_df, get_transform,
        igh_inverse_sql)
    from xcube_spark.queries.resampling_ops import _IGH
    from xcube_spark.sources.zarrio import (cf_grid_mapping_attrs,
                                            crs_from_grid_mapping)

    r = 6378137.0
    # the continuity offset is the solved GCTP constant
    assert abs(_IGH_DY - 0.0528035274542) < 1e-9

    fwd = get_transform("EPSG:4326", "PROJ:IGH")
    inv = get_transform("PROJ:IGH", "EPSG:4326")
    pts = [(-120.0, 35.2), (30.0, -47.6), (179.0, 64.3), (45.0, 52.5),
           (0.5, 0.5), (-179.5, 25.0), (120.0, -84.0), (-50.0, 80.0),
           (-101.0, -30.0), (-99.0, -30.0), (70.0, -70.0),
           (100.0, -44.0), (-39.0, 41.0), (-41.0, 41.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    st = apply_transform_df(df, fwd, F.col("lon"), F.col("lat"), "x", "y")
    st2 = apply_transform_df(st, inv, F.col("x"), F.col("y"),
                             "lon2", "lat2")
    rows = st2.select("lon", "lat", "x", "y", "lon2", "lat2").collect()
    for r2 in rows:
        assert abs(r2.lon2 - r2.lon) < 1e-10
        assert abs(r2.lat2 - r2.lat) < 1e-10

    # interruption pin: 39W and 41W at 41N live in DIFFERENT lobes
    xs = {r2.lon: r2.x for r2 in rows if r2.lat == 41.0}
    assert abs(xs[-39.0] - xs[-41.0]) > 3e6

    # exact continuity at the boundary parallel (central meridian of
    # the 30E north lobe: x is R*lamc on both sides, y fuses)
    phib_deg = math.degrees(_IGH_PHIB)
    eps = 1e-9
    bpts = spark.createDataFrame(
        [(30.0, phib_deg - eps), (30.0, phib_deg + eps)],
        "lon double, lat double")
    bxy = apply_transform_df(bpts, fwd, F.col("lon"), F.col("lat"),
                             "x", "y").select("lat", "x", "y").collect()
    assert abs(bxy[0].y - bxy[1].y) < 1e-3   # < 1 mm per 1e-9 deg
    assert abs(bxy[0].x - bxy[1].x) < 1e-3
    assert abs(bxy[0].y - r * _IGH_PHIB) < 0.2

    # sinusoidal anchors: on a lobe central meridian x = R*lamc
    anchors = spark.createDataFrame(
        [(30.0, 20.0), (-100.0, 20.0), (-160.0, -20.0), (140.0, -20.0)],
        "lon double, lat double")
    got = {(a.lon, a.lat): (a.x, a.y) for a in apply_transform_df(
        anchors, fwd, F.col("lon"), F.col("lat"), "x", "y")
        .select("lon", "lat", "x", "y").collect()}
    for lonc in (30.0, -100.0):
        assert abs(got[(lonc, 20.0)][0] - r * math.radians(lonc)) < 1e-6
        assert abs(got[(lonc, 20.0)][1] - r * math.radians(20.0)) < 1e-6
    for lonc in (-160.0, 140.0):
        assert abs(got[(lonc, -20.0)][0] - r * math.radians(lonc)) < 1e-6

    # CF extension round trip + proj4 resolution
    attrs = cf_grid_mapping_attrs("PROJ:IGH")
    assert attrs["grid_mapping_name"] == "interrupted_goode_homolosine"
    attrs.pop("epsg_code", None)
    assert crs_from_grid_mapping(attrs) == "PROJ:IGH"
    assert resolve_proj4("+proj=igh +a=6378137") == "PROJ:IGH"

    # gate-grid margins via the exact oracle SQL (the grid also stays
    # inside the Mollweide asin domain and off the zone boundaries)
    lon_sql, lat_sql = igh_inverse_sql(
        "(-19947013.0 + (x_i + 0.5) * 997313.0)",
        "(-8579013.0 + (y_i + 0.5) * 429313.0)", "PROJ:IGH")
    mx, my, nn, zb = duckdb.connect().execute(f"""
        WITH tgt AS (SELECT CAST(range // {_IGH.width} AS INT) AS y_i,
                            CAST(range % {_IGH.width} AS INT) AS x_i
                     FROM range({_IGH.width * _IGH.height})),
        ll AS (SELECT y_i, x_i,
                      (-8579013.0 + (y_i + 0.5) * 429313.0) / {r!r} AS yn,
                      {lon_sql} AS lon, {lat_sql} AS lat FROM tgt)
        SELECT min(least((lon+180.0)%1.0, 1.0-(lon+180.0)%1.0))
                   FILTER (lon >= -180 AND lon <= 180),
               min(least((lat+90.0)%1.0, 1.0-(lat+90.0)%1.0)),
               count(*) FILTER (isnan(lon) OR isnan(lat)),
               min(abs(abs(yn) - {_IGH_PHIB!r}))
        FROM ll
    """).fetchone()
    assert nn == 0
    assert mx > 1.5e-3 and my > 1.5e-3
    assert zb > 2e-3
