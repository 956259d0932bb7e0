"""Driver-gate replica: run every oracled queries() entry at sf0.01
against its oracle_sql() with the driver's compare semantics."""
import sys, time
import duckdb
import pandas as pd
import ray
import ray.data as rd

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

Q = E.queries()
O = E.oracle_sql()


def duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_pdf(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


names = list(Q)
only = sys.argv[1:]
if only:
    names = [n for n in names if n in only]
fails = 0
for name in names:
    if name not in O:  # rows-only: execution + row-count check
        t0 = time.time()
        try:
            got = to_pdf(Q[name](SF))
            print(f"ROWS {name} rows={len(got)} {time.time()-t0:.1f}s",
                  flush=True)
        except Exception as ex:
            fails += 1
            print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
        continue
    t0 = time.time()
    try:
        got = norm(to_pdf(Q[name](SF)))
        exp = norm(duck(O[name]))
        assert list(got.columns) == list(exp.columns), \
            (list(got.columns), list(exp.columns))
        assert len(got) == len(exp), (len(got), len(exp))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      check_exact=True)
        print(f"PASS {name} rows={len(got)} {time.time()-t0:.1f}s", flush=True)
    except Exception as ex:
        fails += 1
        print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
print(f"FAILS: {fails} / {len(names)}")
ray.shutdown()
