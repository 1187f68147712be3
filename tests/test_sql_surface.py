"""SQL ST_* surface: SQL-function results must equal the frozen numpy
kernels bit-for-bit across depths and the lon/lat domain."""

import numpy as np
import pandas as pd
import pytest

from osmquadtreepostgis_spark import quadtree as qt
from osmquadtreepostgis_spark.plans.sql_surface import (
    ST_FUNCTIONS,
    register_sql_functions,
)


@pytest.fixture(scope="module")
def st(spark):
    names = register_sql_functions(spark)
    assert names == ST_FUNCTIONS
    return spark


def test_point_to_cell_matches_numpy_all_depths(st):
    rng = np.random.default_rng(11)
    lon = np.concatenate(
        [rng.uniform(-180, 180, 300), [-180.0, 179.999999, 0.0, -180.0]]
    )
    lat = np.concatenate(
        [rng.uniform(-89, 89, 300), [85.06, -85.06, 0.0, 90.0]]
    )
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    df = st.createDataFrame(pdf)
    df.createOrReplaceTempView("pts_sqlsurf")
    for depth in (1, 4, 8, 12, 18, 20):
        got = [
            r["c"]
            for r in st.sql(
                f"SELECT st_point_to_cell(lon, lat, {depth}) AS c"
                " FROM pts_sqlsurf"
            ).collect()
        ]
        want = qt.point_to_cell(lon, lat, depth).tolist()
        assert got == want, f"depth {depth}"


def test_parent_tile_depth_functions(st):
    rng = np.random.default_rng(7)
    cells = qt.point_to_cell(
        rng.uniform(-180, 180, 100), rng.uniform(-85, 85, 100), 18
    )
    shallow = qt.point_to_cell(np.array([10.0]), np.array([50.0]), 2)
    allc = np.concatenate([cells, shallow])
    pdf = pd.DataFrame({"cell": allc})
    st.createDataFrame(pdf).createOrReplaceTempView("cells_sqlsurf")
    got = st.sql(
        "SELECT st_cell_depth(cell) d, st_cell_parent(cell, 4) p,"
        " st_cell_tile(cell, 4) t FROM cells_sqlsurf"
    ).collect()
    for r, c in zip(got, allc.tolist()):
        assert r["d"] == int(qt.cell_depth(np.array([c]))[0])
        assert r["p"] == int(qt.cell_parent(np.array([c]), 4)[0])
        assert r["t"] == int(qt.cell_tile(np.array([c]), 4)[0])


def test_zorder_minzoom_hstore_sql(st):
    row = st.sql(
        "SELECT st_z_order('motorway') z1, st_z_order('no_such') z2,"
        " st_minzoom('motorway', NULL, NULL, NULL, 0.0) mz,"
        " st_hstore(map('b', 'x\"y', 'a', 'p\\\\q')) h"
    ).collect()[0]
    assert row["z1"] == 38 and row["z2"] is None
    assert row["mz"] == 5
    assert row["h"] == '"a"=>"p\\\\q", "b"=>"x\\"y"'


def test_sql_surface_stays_codegen(st):
    """The point of SQL UDFs: calls inline into the plan (no
    BatchEvalPython / ArrowEvalPython nodes)."""
    df = st.sql(
        "SELECT st_cell_tile(st_point_to_cell(1.0, 2.0, 18), 8) AS t"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert df.collect()[0]["t"] == int(
        qt.cell_tile(qt.point_to_cell(np.array([1.0]), np.array([2.0]), 18), 8)[0]
    )
