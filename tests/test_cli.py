"""X8/X9 CLI: scaffold a spec file, point it at fixtures, run transport.

Reference parity: TransportCommand.php:31-45 (resolve class, call
transport()) and CreateCommand.php:35-59 (render template).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(args, **kw):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "database_transportor_spark", *args],
        capture_output=True, text=True, env=env, **kw,
    )


def test_make_scaffold(tmp_path):
    r = _run(["make", "UserMigration", "--dir", str(tmp_path)])
    assert r.returncode == 0, r.stderr
    path = tmp_path / "user_migration.py"
    assert path.exists()
    body = path.read_text()
    assert "MAPS" in body and "ORIGINAL" in body and "TARGET" in body
    # refuses to clobber without --force
    r2 = _run(["make", "UserMigration", "--dir", str(tmp_path)])
    assert r2.returncode != 0


def test_transport_end_to_end(tmp_path):
    out = tmp_path / "out"
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "new_nations": {{
        "original_table": "nation",
        "extra_conditions": [["n_regionkey", "in", [0, 1]]],
        "columns": {{
            "id": "n_nationkey",
            "name": "n_name",
            "source": {{"default": "legacy"}},
        }},
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{SF}"}}
TARGET = {{"kind": "parquet", "root": "{out}"}}
MODE = "overwrite"
SPARK = {{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"}}
'''
    )
    r = _run(["transport", "--spec", str(spec), "--master", "local[2]"],
             timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "new_nations" in r.stdout
    import duckdb

    rows = duckdb.sql(
        f"SELECT count(*), count(DISTINCT source) FROM '{out}/new_nations.parquet/*.parquet'"
    ).fetchall()
    assert rows[0][0] == 10 and rows[0][1] == 1
