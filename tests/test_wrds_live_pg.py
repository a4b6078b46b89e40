"""LIVE-server validation of the WRDS source's generated SQL.

Closes the executable half of VERDICT item "live JDBC execution" as far
as this container allows: there is still no postgresql JDBC jar (so
Spark's JDBC *transport* remains untestable), but the image ships real
PostgreSQL 15 server binaries — so every query string
``JdbcWrdsSource`` generates can be executed against a genuine Postgres
server loaded with a WRDS-shaped fixture schema. That validates, live:

* SQL syntax and semantics (quoting, date literals, ``at`` as a column
  name, ``cast(null as double precision)`` padding, joins, aliases),
* the candidate-probing DEGRADE order of ``_probe_read`` — optional
  tables are genuinely absent server-side here, so the fallback path
  is exercised by a real "relation does not exist" error, not a mock,
* row-level results for seeded fixture data.

The transport swap is one subclass overriding ``_read`` to run the
query through ``psql --csv`` instead of ``spark.read.format("jdbc")``;
everything else (query text, probe loop, fallback schema handling) is
the production code path. Reference parity: wrds_ingestion.py's
loaders run these same statements over psycopg2/SQLAlchemy.

Skipped automatically when the postgres binaries or the ``postgres``
system user are unavailable.
"""

from __future__ import annotations

import io
import shutil
import subprocess
import tempfile
from pathlib import Path

import pandas as pd
import pytest

from quantlab_data_pipeline_spark.sources import wrds as wrds_mod
from quantlab_data_pipeline_spark.sources.wrds import JdbcWrdsSource

PORT = 54333

_missing = [b for b in ("initdb", "pg_ctl", "psql", "su") if shutil.which(b) is None]
pytestmark = pytest.mark.skipif(
    bool(_missing), reason=f"postgres binaries unavailable: {_missing}"
)


def _su_pg(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-c", cmd], capture_output=True, text=True
    )


# WRDS-shaped fixture: mandatory tables present; StkDelists, recddet,
# tr_ibes.det_rec, and fivefactors_daily DELIBERATELY absent so the
# degrade candidates fall through on live "relation does not exist"
# errors; dsp500 uses the caldt column name so benchmark()'s
# column-name probing exercises its second candidate.
FIXTURE_SQL = """
create schema crsp;
create schema comp;
create schema comp_global_daily;
create schema tr_ibes;
create schema ibes;
create schema ff_all;

create table crsp.dsp500list (permno int, start date, ending date);
insert into crsp.dsp500list values
  (10001, '2019-01-01', '2021-12-31'),
  (10002, '2020-03-01', '2099-12-31'),
  (10003, '1990-01-01', '1999-12-31');

create table crsp.dsenames (
  permno int, ticker text, ncusip text, namedt date, nameendt date);
insert into crsp.dsenames values
  (10001, 'ALPH', '00032100', '2019-01-01', null),
  (10001, 'ALPH', '00032100', '2019-01-01', null),
  (10002, 'BRVO', '00045209', '2020-03-01', '2020-12-31'),
  (10002, 'BRV2', '00045217', '2021-01-01', null),
  (10003, 'CHRL', null,       '1990-01-01', '1999-12-31');

create table crsp.dsf (
  date date, permno int, openprc double precision, askhi double precision,
  bidlo double precision, prc double precision, cfacpr double precision,
  ret double precision, shrout double precision, vol double precision);
insert into crsp.dsf values
  ('2021-06-01', 10001, 10.0, 10.5, 9.9, 10.2, 1.0, 0.01, 1000, 500),
  ('2021-06-02', 10001, 10.2, 10.8, 10.1, 10.6, 1.0, 0.0392, 1000, 600),
  ('2021-06-01', 10002, 20.0, 20.5, 19.5, 20.1, 2.0, -0.002, 2000, 700),
  ('1995-06-01', 10003,  5.0,  5.2,  4.9,  5.1, 1.0, 0.0, 500, 100);

create table crsp.msf (
  date date, permno int, prc double precision, ret double precision,
  vol double precision, shrout double precision);
insert into crsp.msf values
  ('2021-06-30', 10001, 10.9, 0.05, 12000, 1000),
  ('2021-06-30', 10002, 21.0, 0.02, 14000, 2000);

-- legacy delist table present; CIZ-format crsp.StkDelists absent
create table crsp.dsedelist (
  permno int, dlstdt date, dlret double precision);
insert into crsp.dsedelist values (10002, '2021-07-15', -0.35);

create table crsp.msedist (
  permno int, distcd int, divamt double precision, facpr double precision,
  facshr double precision, paydt date);
insert into crsp.msedist values
  (10001, 1232, 0.25, 0, 0, '2021-06-15'),
  (10002, 1232, 0.40, 0, 0, '2022-01-15');

create table crsp.ccmxpf_linktable (
  gvkey text, lpermno int, linktype text, linkprim text,
  linkdt date, linkenddt date);
insert into crsp.ccmxpf_linktable values
  ('001001', 10001, 'LU', 'P', '2019-01-01', null),
  ('001002', 10002, 'LC', 'C', '2020-03-01', null),
  ('001003', 10003, 'NR', 'N', '1990-01-01', null);

create table comp_global_daily.g_company (gvkey text, ipodate date);
insert into comp_global_daily.g_company values
  ('001001', '2018-12-15'), ('001002', '2020-02-20');

-- full column set INCLUDING xrd, so fundamentals()'s first candidate
-- succeeds live (the core-set fallback is covered by the offline
-- degrade pytest)
create table comp.funda (
  gvkey text, datadate date, indfmt text, datafmt text, popsrc text,
  consol text, revt double precision, sale double precision,
  ni double precision, at double precision, ceq double precision,
  dltt double precision, pstk double precision, oancf double precision,
  capx double precision, xrd double precision);
insert into comp.funda values
  ('001001', '2020-12-31', 'INDL', 'STD', 'D', 'C',
   100, 100, 10, 500, 200, 50, 0, 30, 20, 5),
  ('001001', '2020-12-31', 'INDL', 'SUMM_STD', 'D', 'C',
   999, 999, 99, 999, 999, 99, 9, 99, 99, 9),
  ('001002', '2020-12-31', 'INDL', 'STD', 'D', 'C',
   300, 300, 30, 900, 400, 80, 0, 90, 60, 15);

create table tr_ibes.id (
  ticker text, cusip text, cname text, sdates date);
insert into tr_ibes.id values
  ('ALPH', '00032100', 'Alpha Corp', '2019-02-01'),
  ('BRVO', '00045209', 'Bravo Inc', '2020-04-01'),
  ('ZLAT', '99999999', 'Too Late', '2098-01-01');

create table tr_ibes.recdsum (
  statpers date, ticker text, oftic text, cusip text, cname text,
  buypct double precision, holdpct double precision,
  sellpct double precision, meanrec double precision,
  medrec double precision, stdev double precision,
  numup int, numdown int, numrec int, usfirm int);
insert into tr_ibes.recdsum values
  ('2021-06-17', 'ALPH', 'ALPH', '00032100', 'Alpha Corp',
   60, 30, 10, 1.8, 2, 0.4, 2, 1, 10, 1);

-- tr_ibes.recddet and tr_ibes.det_rec absent -> third candidate wins
create table ibes.det_rec (
  ticker text, statpers date, analys bigint, ireccd double precision);
insert into ibes.det_rec values ('ALPH', '2021-06-10', 501, 2);

-- fivefactors_daily absent -> ff_factors degrades to factors_daily
create table ff_all.factors_daily (
  date date, mktrf double precision, smb double precision,
  hml double precision, rf double precision, umd double precision);
insert into ff_all.factors_daily values
  ('2021-06-01', 0.001, 0.0002, -0.0001, 0.00001, 0.0005),
  ('2021-06-02', -0.002, 0.0001, 0.0003, 0.00001, -0.0002);

-- dsp500 ships caldt, not date: first benchmark candidate must fail
create table crsp.dsp500 (caldt date, vwretd double precision);
insert into crsp.dsp500 values
  ('2021-06-01', 0.0012), ('2021-06-02', -0.0008);
"""


@pytest.fixture(scope="module")
def pg_socket_dir():
    base = Path(tempfile.mkdtemp(prefix="wrds_live_pg_"))
    data, sock = base / "data", base / "sock"
    sock.mkdir()
    base.chmod(0o777)
    sock.chmod(0o777)
    subprocess.run(["chown", "-R", "postgres:postgres", str(base)], check=True)
    r = _su_pg(f"initdb -D {data} -U wrds --no-sync -A trust")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-400:]}")
    r = _su_pg(
        f"pg_ctl -D {data} -o '-k {sock} -p {PORT} "
        f"-c listen_addresses=\"\"' -w -l {base}/log start"
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-400:]}")
    try:
        subprocess.run(
            ["psql", "-h", str(sock), "-p", str(PORT), "-U", "wrds",
             "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-X", "-q"],
            input=FIXTURE_SQL, capture_output=True, text=True, check=True,
        )
        yield str(sock)
    finally:
        _su_pg(f"pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


class PsqlWrdsSource(JdbcWrdsSource):
    """Production query generation + probe/degrade logic, transport
    swapped from Spark-JDBC to ``psql --csv`` (no driver jar in the
    image). ``partition_on_date`` changes only how Spark SPLITS the
    read, never the rows, so it is a no-op here."""

    def __init__(self, socket_dir: str):
        self.socket_dir = socket_dir
        self.captured: list[str] = []

        class _EmptyFrameFactory:
            def createDataFrame(self, rows, schema):
                cols = [f.split()[0] for f in schema.split(",")]
                return pd.DataFrame(columns=cols)

        self.spark = _EmptyFrameFactory()

    def _read(self, query, partition_on_date=None):
        self.captured.append(query)
        r = subprocess.run(
            ["psql", "-h", self.socket_dir, "-p", str(PORT), "-U", "wrds",
             "-d", "postgres", "-X", "--csv", "-v", "ON_ERROR_STOP=1",
             "-c", query],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            raise RuntimeError(f"psql: {r.stderr.strip()[:200]}")
        # identifier-like columns stay text (gvkey '001001' must not
        # become the int 1001 — the semi filter compares strings)
        return pd.read_csv(
            io.StringIO(r.stdout),
            dtype={"gvkey": str, "ticker": str, "cusip": str, "ncusip": str},
        )


@pytest.fixture()
def live(pg_socket_dir, monkeypatch):
    # pandas twin of the Spark-side semi filter
    monkeypatch.setattr(
        wrds_mod, "_semi_filter",
        lambda df, col, values: df[df[col].isin(list(values))]
        if len(df) else df,
    )
    return PsqlWrdsSource(pg_socket_dir)


def test_sp500_universe_range_filter(live):
    out = live.sp500_universe("2020-01-01", "2021-12-31")
    assert sorted(out["permno"]) == [10001, 10002]


def test_stock_names_distinct_and_semi_filter(live):
    out = live.stock_names([10001, 10002])
    assert len(out) == 3  # duplicate 10001 row collapsed by DISTINCT
    assert set(out["ticker"]) == {"ALPH", "BRVO", "BRV2"}


def test_ipo_dates_link_join(live):
    out = live.ipo_dates([10001, 10002, 10003])
    # 10003's NR/N link fails the linktype/linkprim filter
    assert dict(zip(out["asset_id"], out["ipodate"])) == {
        10001: "2018-12-15", 10002: "2020-02-20",
    }


def test_daily_prices_date_window(live):
    out = live.daily_prices([10001, 10002], "2021-06-01", "2021-06-30")
    assert len(out) == 3
    assert set(out.columns) >= {"date", "permno", "open", "high", "low",
                                "close", "cfacpr", "ret", "shrout", "volume"}


def test_delist_falls_back_to_legacy_table_live(live):
    out = live.delist_events([10002], "2021-01-01", "2021-12-31")
    assert len(out) == 1 and float(out["dlret"].iloc[0]) == -0.35
    # first candidate really was attempted against the live server
    assert "StkDelists" in live.captured[0]
    assert "dsedelist" in live.captured[1]


def test_dividends_pay_date_window(live):
    out = live.dividends([10001, 10002], "2021-01-01", "2021-12-31")
    assert len(out) == 1 and float(out["divamt"].iloc[0]) == 0.25


def test_ccm_links_type_filter(live):
    out = live.ccm_links([10001, 10002, 10003], "2021-12-31")
    assert sorted(out["permno"]) == [10001, 10002]


def test_fundamentals_full_candidate_succeeds(live):
    out = live.fundamentals(["001001", "001002"], "2020-01-01", "2020-12-31")
    # SUMM_STD row excluded by datafmt='STD'
    assert len(out) == 2
    assert float(out.loc[out["gvkey"] == "001001", "xrd"].iloc[0]) == 5.0
    assert len(live.captured) == 1  # no degrade needed


def test_ibes_ids_sdates_cutoff(live):
    out = live.ibes_ids("2021-12-31")
    assert set(out["ticker"]) == {"ALPH", "BRVO"}  # ZLAT starts 2098


def test_cusip_names_validity_window(live):
    out = live.crsp_cusip_names([10001, 10002], "2020-06-01", "2021-06-30")
    # 10002's first cusip line ends 2020-12-31 >= start, second is
    # open-ended; 10001's duplicated name line passes through twice (no
    # DISTINCT in this query — validity rows are unique in real data)
    assert len(out) == 4
    assert out["ncusip"].notna().all()


def test_consensus_statpers_window(live):
    out = live.consensus(["ALPH"], "2021-06-01", "2021-06-30")
    assert len(out) == 1 and float(out["meanrec"].iloc[0]) == 1.8


def test_ratings_detail_third_candidate_wins_live(live):
    out = live.ratings_detail(["ALPH"], "2021-06-01", "2021-06-30")
    assert len(out) == 1 and int(out["analys"].iloc[0]) == 501
    assert "recddet" in live.captured[0]
    assert "tr_ibes.det_rec" in live.captured[1]
    assert "ibes.det_rec" in live.captured[2]


def test_ff_factors_degrade_pads_rmw_cma_live(live):
    out = live.ff_factors("2021-06-01", "2021-06-30")
    assert len(out) == 2
    assert out["rmw"].isna().all() and out["cma"].isna().all()
    assert "fivefactors_daily" in live.captured[0]


def test_benchmark_column_name_probe_live(live):
    out = live.benchmark("2021-06-01", "2021-06-30")
    assert list(out.columns) == ["date", "ret"]
    assert len(out) == 2
    # first candidate (date column) failed on the live caldt schema
    assert "select date" in live.captured[0]
    assert "caldt" in live.captured[1]


def test_optional_branch_degrades_to_empty_when_all_absent(pg_socket_dir, monkeypatch):
    monkeypatch.setattr(wrds_mod, "_semi_filter", lambda df, c, v: df)
    src = PsqlWrdsSource(pg_socket_dir)
    out = src._probe_read(
        ["select * from crsp.no_such_table"],
        "asset_id long, date date", "degrade_probe",
    )
    assert len(out) == 0 and list(out.columns) == ["asset_id", "date"]
