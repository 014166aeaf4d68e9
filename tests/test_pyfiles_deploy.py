"""North-rule deployment path: spark-submit --py-files must work with
the built zip artifact ALONE — no repo checkout on the cluster. This
drives the real binary end to end: build the zip, run the checkpointed
extraction job from a scratch cwd with the repo stripped from
PYTHONPATH (so every import, including the bundled gazetteer resources,
must resolve through the zip importer), and read the output back."""

import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """\
import sys
from material_parsers_spark.__main__ import main

sys.exit(main(sys.argv[1:]))
"""


@pytest.mark.skipif(not os.path.exists("/opt/spark/bin/spark-submit"),
                    reason="spark-submit binary not available")
def test_spark_submit_with_pyfiles_zip_runs_the_extraction_job():
    sys.path.insert(0, REPO)
    from tools.build_pyfiles import build

    with tempfile.TemporaryDirectory() as tmp:
        zip_path = build(os.path.join(tmp, "material_parsers_spark.zip"))
        driver = os.path.join(tmp, "driver.py")
        with open(driver, "w") as fh:
            fh.write(DRIVER)
        out_dir = os.path.join(tmp, "out")
        manifest = os.path.join(tmp, "manifest")

        env = dict(os.environ)
        env.pop("PYTHONPATH", None)          # imports must come from the zip
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        proc = subprocess.run(
            ["/opt/spark/bin/spark-submit",
             "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=4",
             "--py-files", zip_path,
             driver,
             "run", "--generate", "400",
             "--output", out_dir,
             "--manifest", manifest,
             "--run-id", "pyfiles-test",
             "--buckets", "4"],
            cwd=tmp, env=env, capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-4000:]

        import duckdb
        n = duckdb.sql(
            f"SELECT count(*) FROM '{out_dir}/**/*.parquet'").fetchone()[0]
        assert n > 0
