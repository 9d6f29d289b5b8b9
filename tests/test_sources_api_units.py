"""API source pagination (offline, injected transport), unit registry,
thermo plumbing, lineage rendering."""

import pandas as pd
import pytest
from pyspark.sql import Row

from odibi_spark.sources.api import fetch_all, read_api


def make_paged_transport(pages, link_urls=None):
    calls = []

    def transport(url, params):
        calls.append((url, dict(params)))
        if link_urls is not None:
            idx = link_urls.index(url)
            headers = (
                {"Link": f'<{link_urls[idx + 1]}>; rel="next"'}
                if idx + 1 < len(link_urls)
                else {}
            )
            return pages[idx], headers
        if "page" in params:
            i = params["page"] - 1
        elif "offset" in params:
            i = params["offset"] // max(params.get("limit", 1), 1)
        elif "cursor" in params:
            i = int(params["cursor"])
        else:
            i = 0
        return (pages[i] if i < len(pages) else {"items": []}), {}

    transport.calls = calls
    return transport


class TestApiPagination:
    def test_page_pagination(self):
        t = make_paged_transport(
            [{"items": [{"id": 1}, {"id": 2}]}, {"items": [{"id": 3}]}, {"items": []}]
        )
        recs = fetch_all("http://x/api", transport=t, pagination="page",
                         records_path="items")
        assert [r["id"] for r in recs] == [1, 2, 3]

    def test_offset_pagination_stops_on_short_page(self):
        t = make_paged_transport(
            [{"items": [{"id": i} for i in range(3)]}, {"items": [{"id": 99}]}]
        )
        recs = fetch_all("http://x/api", transport=t, pagination="offset",
                         page_size=3, records_path="items")
        assert len(recs) == 4
        assert t.calls[1][1]["offset"] == 3

    def test_cursor_pagination(self):
        pages = [
            {"items": [{"id": 1}], "next_cursor": "1"},
            {"items": [{"id": 2}], "next_cursor": None},
        ]
        t = make_paged_transport(pages)
        recs = fetch_all("http://x/api", transport=t, pagination="cursor",
                         records_path="items")
        assert [r["id"] for r in recs] == [1, 2]

    def test_link_header_pagination(self):
        urls = ["http://x/1", "http://x/2"]
        t = make_paged_transport(
            [{"items": [{"id": 1}]}, {"items": [{"id": 2}]}], link_urls=urls
        )
        recs = fetch_all(urls[0], transport=t, pagination="link", records_path="items")
        assert [r["id"] for r in recs] == [1, 2]

    def test_retry_then_succeed(self):
        attempts = []

        def flaky(url, params):
            attempts.append(1)
            if len(attempts) < 3:
                raise OSError("boom")
            return {"items": [{"id": 7}]}, {}

        recs = fetch_all("http://x", transport=flaky, records_path="items",
                         retries=3, backoff_s=0.01)
        assert [r["id"] for r in recs] == [7] and len(attempts) == 3

    def test_read_api_to_dataframe(self, spark):
        t = make_paged_transport([{"items": [{"id": 1, "v": "a"}]}])
        df = read_api(spark, "http://x", transport=t, records_path="items",
                      schema="id long, v string")
        assert df.collect() == [Row(id=1, v="a")]


class TestUnits:
    def test_temperature_roundtrip(self, spark, make_ec):
        from odibi_spark.registry import get_registry

        df = spark.createDataFrame([Row(t_f=212.0), Row(t_f=32.0)])
        out = get_registry().apply(
            "convert_units", make_ec(df),
            {"column": "t_f", "family": "temperature", "from_unit": "F",
             "to_unit": "C", "output_column": "t_c"},
        ).df
        vals = [r.t_c for r in out.orderBy("t_f").collect()]
        assert vals[0] == pytest.approx(0.0, abs=1e-9)
        assert vals[1] == pytest.approx(100.0, abs=1e-9)

    def test_gauge_pressure_offset(self):
        from odibi_spark.operators.units import conversion

        a, b = conversion("pressure", "psig", "Pa")
        assert 0.0 * a + b == pytest.approx(101325.0)  # 0 psig = 1 atm absolute

    def test_unknown_unit_names_known(self):
        from odibi_spark.operators.units import conversion

        with pytest.raises(KeyError, match="known"):
            conversion("temperature", "F", "rankine")


class TestThermo:
    def test_injectable_backend(self, spark, make_ec):
        from odibi_spark.operators import thermo
        from odibi_spark.registry import get_registry

        thermo.register_backend(
            lambda fluid, prop, t, p: t * 2.0 if prop == "D" else p / 1000.0
        )
        df = spark.createDataFrame([Row(temp=300.0, pres=100000.0)])
        out = get_registry().apply(
            "fluid_properties", make_ec(df),
            {"fluid": "Water", "properties": ["D", "H"],
             "temperature_col": "temp", "pressure_col": "pres"},
        ).df
        r = out.collect()[0]
        assert r.prop_D == 600.0 and r.prop_H == 100.0

    def test_psychrometrics_backend_and_units(self, spark, make_ec):
        """Humid-air operator (reference thermodynamics.py:676-1048):
        fake HAPropsSI checks the unit plumbing — degC converted to K,
        RH percent scaled to 0-1, elevation -> standard pressure."""
        from odibi_spark.operators import thermo
        from odibi_spark.registry import get_registry

        def fake_ha(prop, t_k, p_pa, second_key, second):
            # the UDF runs in a worker process, so the key check must be
            # encoded in the OUTPUT (a closure-mutated dict never makes
            # it back to the driver): W is positive only for key 'R'
            if prop == "W":
                return second * (0.01 if second_key == "R" else -1.0)
            return t_k + p_pa / 100000.0  # mixes both inputs

        thermo.register_ha_backend(fake_ha)
        df = spark.createDataFrame([Row(t_c=25.0, rh=50.0)])
        out = get_registry().apply(
            "psychrometrics", make_ec(df),
            {"properties": ["W", "B"], "dry_bulb_col": "t_c",
             "relative_humidity_col": "rh", "rh_is_percent": True,
             "temperature_unit": "C", "elevation_m": 0.0},
        ).df
        r = out.collect()[0]
        assert r.psy_W == pytest.approx(0.5 * 0.01)       # key was 'R'; 50% -> 0.5 -> *0.01
        assert r.psy_B == pytest.approx(298.15 + 1.01325) # K + atm/1e5

    def test_psychrometrics_requires_exactly_one_humidity_input(self, spark, make_ec):
        from odibi_spark.operators import thermo
        from odibi_spark.registry import get_registry

        thermo.register_ha_backend(lambda *a: a[1])
        df = spark.createDataFrame([Row(t=300.0, rh=0.5, w=0.01)])
        with pytest.raises(ValueError, match="exactly one"):
            get_registry().apply(
                "psychrometrics", make_ec(df),
                {"properties": ["W"], "dry_bulb_col": "t",
                 "relative_humidity_col": "rh", "humidity_ratio_col": "w"},
            )

    def test_cross_check_operator(self, spark, make_ec):
        """cross_check named transform (reference validation.py:14-171):
        row_count_diff within threshold passes, schema divergence raises."""
        from odibi_spark.registry import get_registry

        df = spark.createDataFrame([Row(a=1)])
        ec = make_ec(df)
        ec.context.register("na", spark.range(100).selectExpr("id AS a"))
        ec.context.register("nb", spark.range(103).selectExpr("id AS a"))
        ec.context.register("nc", spark.range(5).selectExpr("id AS b"))
        out = get_registry().apply(
            "cross_check", ec,
            {"type": "row_count_diff", "inputs": ["na", "nb"], "threshold": 0.05},
        )
        assert out.df is ec.df  # pass-through
        with pytest.raises(ValueError, match="row_count_diff"):
            get_registry().apply(
                "cross_check", ec,
                {"type": "row_count_diff", "inputs": ["na", "nb"]},
            )
        with pytest.raises(ValueError, match="schema mismatch"):
            get_registry().apply(
                "cross_check", ec,
                {"type": "schema_match", "inputs": ["na", "nc"]},
            )


class TestLineage:
    def test_lineage_and_story(self, spark, tmp_path):
        from odibi_spark.lineage import pipeline_lineage, render_story
        from odibi_spark.plans import Pipeline

        src = str(tmp_path / "src")
        spark.createDataFrame([Row(a=1)]).write.mode("overwrite").parquet(src)
        y = f"""
name: lin
nodes:
  - name: src
    read: {{format: parquet, path: "{src}"}}
  - name: child
    depends_on: [src]
    transform:
      - {{function: derive_columns, params: {{columns: {{b: "a * 2"}}}}}}
    validation:
      tests:
        - {{name: has_rows, type: row_count, min: 1}}
"""
        pipe = Pipeline.from_yaml(y, spark)
        results = pipe.run()
        lin = pipeline_lineage(pipe.config)
        child = next(n for n in lin["nodes"] if n["name"] == "child")
        assert child["inputs"] == ["src"] and child["transforms"] == ["derive_columns"]
        html_doc = render_story(pipe.config, results, path=str(tmp_path / "story.html"))
        assert "lin" in html_doc and "success" in html_doc and "has_rows" in html_doc


class TestSaturationProperties:
    """Registered name parity with the reference (thermodynamics.py
    :560-656) + the closed-form IAPWS-IF97 Water path pinned against
    published steam-table values (VERDICT r9 task 3)."""

    def _apply(self, make_ec, df, params):
        from odibi_spark.registry import get_registry

        return get_registry().apply(
            "saturation_properties", make_ec(df), params
        ).df

    def test_tsat_from_pressure_published_values(self, spark, make_ec):
        # steam tables: Tsat(101325 Pa) = 100.00 degC,
        # Tsat(1.5549 MPa) = 200.00 degC
        df = spark.createDataFrame(
            [Row(p=101325.0), Row(p=1554900.0)]
        )
        out = self._apply(
            make_ec, df,
            {"pressure_col": "p", "properties": ["T"], "phase": "vapor"},
        )
        t = [r.sat_T - 273.15 for r in out.orderBy("p").collect()]
        assert t[0] == pytest.approx(100.0, abs=0.05)
        assert t[1] == pytest.approx(200.0, abs=0.05)

    def test_psat_from_temperature_published_values(self, spark, make_ec):
        # steam tables: psat(25 degC) = 3.1699 kPa, psat(150) = 476.16
        # kPa, psat(300) = 8587.9 kPa
        df = spark.createDataFrame([Row(t=25.0), Row(t=150.0), Row(t=300.0)])
        out = self._apply(
            make_ec, df,
            {"temperature_col": "t", "temperature_unit": "C",
             "properties": ["P"]},
        )
        p = [r.sat_P for r in out.orderBy("t").collect()]
        assert p[0] == pytest.approx(3169.9, rel=2e-3)
        assert p[1] == pytest.approx(476160.0, rel=2e-3)
        assert p[2] == pytest.approx(8587900.0, rel=2e-3)

    def test_enthalpy_liquid_and_vapor(self, spark, make_ec):
        # steam tables at 100 degC: hf = 419.04 kJ/kg, hg = 2676.1
        df = spark.createDataFrame([Row(t=100.0)])
        hf = self._apply(
            make_ec, df,
            {"temperature_col": "t", "temperature_unit": "C",
             "phase": "liquid", "properties": ["H"]},
        ).first().sat_H
        hg = self._apply(
            make_ec, df,
            {"temperature_col": "t", "temperature_unit": "C",
             "phase": "vapor", "properties": ["H"]},
        ).first().sat_H
        assert hf == pytest.approx(419040.0, rel=0.01)
        assert hg == pytest.approx(2676100.0, rel=0.01)

    def test_reference_yaml_shape_psig_and_output_units(self, spark, make_ec):
        """The reference docstring scenario: saturated steam at psig
        with outputs [{property, unit, output_column}] — 0 psig =
        1 atm absolute -> sat temp ~212 degF, hg ~1150 BTU/lb."""
        df = spark.createDataFrame([Row(steam_pressure=0.0)])
        out = self._apply(
            make_ec, df,
            {"fluid": "Water", "pressure_col": "steam_pressure",
             "pressure_unit": "psig", "phase": "vapor",
             "outputs": [
                 {"property": "H", "unit": "BTU/lb", "output_column": "hg"},
                 {"property": "T", "unit": "degF", "output_column": "sat_temp"},
             ]},
        ).first()
        assert out.sat_temp == pytest.approx(212.0, abs=0.2)
        assert out.hg == pytest.approx(1150.3, rel=0.01)

    def test_roundtrip_psat_tsat(self, spark, make_ec):
        """IF97's quartic formulation inverts exactly: Tsat(psat(T))
        returns T to ~1e-6 K."""
        df = spark.createDataFrame([Row(t=310.0), Row(t=450.0), Row(t=600.0)])
        p = self._apply(make_ec, df, {"temperature_col": "t",
                                      "properties": ["P"]})
        t2 = self._apply(make_ec, p, {"pressure_col": "sat_P",
                                      "properties": ["T"],
                                      "prefix": "rt_"})
        for r in t2.collect():
            assert r.rt_T == pytest.approx(r.t, abs=1e-6)

    def test_backend_path_and_reset(self, spark, make_ec):
        """An injected backend (CoolProp seam) takes over from the
        closed-form path: fluid/phase/key all reach it."""
        from odibi_spark.operators import thermo

        def fake(fluid, prop, phase, key, values):
            import pandas as pd

            base = {"liquid": 1.0, "vapor": 2.0}[phase]
            return pd.Series(values) * base + (100.0 if key == "P" else 0.0)

        thermo.register_sat_backend(fake)
        try:
            df = spark.createDataFrame([Row(p=10.0)])
            out = self._apply(
                make_ec, df,
                {"fluid": "Ammonia", "pressure_col": "p",
                 "phase": "vapor", "properties": ["T"]},
            ).first()
            assert out.sat_T == pytest.approx(10.0 * 2.0 + 100.0)
        finally:
            thermo.register_sat_backend(None)
            thermo._SAT_BACKEND = None

    def test_validation_errors(self, spark, make_ec):
        df = spark.createDataFrame([Row(p=1.0, t=1.0)])
        with pytest.raises(ValueError, match="pressure or temperature"):
            self._apply(make_ec, df, {"properties": ["T"]})
        with pytest.raises(ValueError, match="not both"):
            self._apply(make_ec, df, {"pressure_col": "p",
                                      "temperature_col": "t",
                                      "properties": ["T"]})
        with pytest.raises(NotImplementedError, match="CoolProp"):
            self._apply(make_ec, df, {"pressure_col": "p",
                                      "fluid": "Ammonia",
                                      "properties": ["T"]})
        with pytest.raises(NotImplementedError, match="T/P/H"):
            self._apply(make_ec, df, {"pressure_col": "p",
                                      "properties": ["D"]})

    def test_registry_name_parity(self):
        """The reference registers 'saturation_properties'
        (odibi/transformers/__init__.py:137-138); a ported YAML must
        resolve the name here too."""
        from odibi_spark.registry import get_registry

        assert get_registry().has("saturation_properties")


class TestPsychrometricsNative:
    def test_matches_published_values(self, spark):
        """20 degC / 50% RH at sea level: the ASHRAE/Magnus/Stull
        textbook point (dew point 9.26, humidity ratio 0.00724,
        enthalpy 38.5 kJ/kg, wet bulb 13.7)."""
        from odibi_spark.operators.thermo import with_psychrometrics_native

        df = spark.createDataFrame(
            [(20.0, 0.5), (30.0, 0.8)], ["t_c", "rh"]
        )
        got = {
            r.t_c: r
            for r in with_psychrometrics_native(
                df, dry_bulb_c_col="t_c", relative_humidity_col="rh"
            ).collect()
        }
        r20 = got[20.0]
        assert r20.psy_svp_pa == pytest.approx(2333.44, abs=0.5)
        assert r20.psy_humidity_ratio == pytest.approx(0.0072449, rel=1e-4)
        assert r20.psy_dew_point_c == pytest.approx(9.261, abs=0.01)
        assert r20.psy_enthalpy_kj_kg == pytest.approx(38.509, abs=0.01)
        assert r20.psy_wet_bulb_c == pytest.approx(13.699, abs=0.01)
        r30 = got[30.0]
        assert r30.psy_dew_point_c == pytest.approx(26.171, abs=0.01)
        assert r30.psy_wet_bulb_c == pytest.approx(27.13, abs=0.01)

    def test_rh_percent_and_pressure_column(self, spark):
        from odibi_spark.operators.thermo import with_psychrometrics_native

        df = spark.createDataFrame([(20.0, 50.0, 90000.0)], ["t", "rh", "p"])
        r = with_psychrometrics_native(
            df, dry_bulb_c_col="t", relative_humidity_col="rh",
            pressure_pa_col="p", rh_is_percent=True,
        ).collect()[0]
        # lower pressure -> higher humidity ratio for the same vp
        assert r.psy_humidity_ratio == pytest.approx(
            0.621945 * 1166.72 / (90000.0 - 1166.72), rel=1e-4
        )

    def test_no_python_in_plan(self, spark):
        from odibi_spark.operators.thermo import with_psychrometrics_native

        df = spark.range(100).selectExpr(
            "CAST(id % 40 AS DOUBLE) AS t", "0.5 AS rh"
        )
        plan = (
            with_psychrometrics_native(
                df, dry_bulb_c_col="t", relative_humidity_col="rh"
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan


def test_plant_monitoring_example_yaml_runs(spark, tmp_path):
    """examples/plant_monitoring.yaml end-to-end: YAML simulation
    source (format: simulation — no input files) -> native
    psychrometrics -> physical-invariant validation -> SQL rollup."""
    import pathlib

    from odibi_spark.plans.pipeline import Pipeline

    y = pathlib.Path("examples/plant_monitoring.yaml").read_text()
    y = y.replace("base_path: /tmp/odibi_plant", f"base_path: {tmp_path}")
    results = Pipeline.from_yaml(y, spark).run()
    for node in ("sensor_states", "sensor_rollup"):
        assert results[node].status == "success", (node, results[node].error)
    states = spark.read.parquet(str(tmp_path / "states"))
    assert states.count() == 5000
    # the validated physical invariant really holds in the output
    assert states.filter("psy_dew_point_c > t_c").count() == 0
    rollup = spark.read.parquet(str(tmp_path / "rollup"))
    assert rollup.count() == 4
    assert {"sensor", "n", "avg_dew_point", "max_wet_bulb"} <= set(rollup.columns)


class TestPsychrometricInvariants:
    def test_wet_bulb_sandwich_and_monotonicity(self, spark):
        """Textbook invariants over a grid spanning Stull's validity
        range (5-99% RH, -10..45 degC): dew point <= wet bulb <=
        dry bulb (with a small tolerance for the regression fit), and
        both dew point and humidity ratio increase with RH at fixed
        temperature."""
        from odibi_spark.operators.thermo import with_psychrometrics_native

        grid = spark.sql(
            "SELECT t_c, rh FROM "
            "(SELECT explode(sequence(-10, 45, 5)) AS t_c) "
            "CROSS JOIN (SELECT explode(array(0.05, 0.2, 0.4, 0.6, 0.8, 0.99)) AS rh)"
        )
        rows = with_psychrometrics_native(
            grid, dry_bulb_c_col="t_c", relative_humidity_col="rh"
        ).collect()
        for r in rows:
            assert r.psy_dew_point_c <= r.t_c + 1e-9, r
            # Stull's fit carries ~0.35 degC error; the sandwich holds
            # within that envelope
            assert r.psy_dew_point_c - 0.6 <= r.psy_wet_bulb_c <= r.t_c + 0.6, r
            assert r.psy_humidity_ratio > 0
        by_t = {}
        for r in rows:
            by_t.setdefault(r.t_c, []).append((r.rh, r.psy_dew_point_c, r.psy_humidity_ratio))
        for t, series in by_t.items():
            series.sort()
            tds = [td for _, td, _ in series]
            ws = [w for _, _, w in series]
            assert tds == sorted(tds), (t, tds)
            assert ws == sorted(ws), (t, ws)


class TestApiDeclarativeRead:
    def test_read_source_dispatches_api(self, spark):
        """Review r7: 'api' is advertised by list_formats, so the
        declarative read path must actually dispatch it (options pass
        through un-stringified: transport is a callable)."""
        from odibi_spark.io.read import read_source

        pages = {None: ({"items": [{"k": 1}, {"k": 2}]}, {})}

        def transport(url, params):
            return pages[None]

        df = read_source(
            spark, format="api", path="http://x/items",
            schema="k long",
            options={"transport": transport, "records_path": "items"},
        )
        assert [r.k for r in df.orderBy("k").collect()] == [1, 2]
