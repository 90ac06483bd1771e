"""jobs/flagship_job.py: resumable ray-job entry for the flagship."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jobs.flagship_job import main as job_main  # noqa: E402

from axosyslog_ray.synth import pages_dataset  # noqa: E402


@pytest.fixture()
def pages_dir(tmp_path, ray_session):
    d = tmp_path / "pages"
    pages_dataset(3000, blocks=6).write_parquet(str(d))
    return str(d)


class TestFlagshipJob:
    def test_runs_and_resumes(self, pages_dir, tmp_path, capsys, ray_session):
        out = str(tmp_path / "routed")
        rc = job_main(["--input", pages_dir, "--output", out,
                       "--num-parts", "3"])
        assert rc == 0
        rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep1["partitions_run"] >= 1
        assert rep1["partitions_skipped"] == 0
        assert sum(rep1["sink_counts"].values()) == 3000

        # a second submit reprocesses NOTHING, same totals
        rc = job_main(["--input", pages_dir, "--output", out,
                       "--num-parts", "3"])
        assert rc == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["partitions_run"] == 0
        assert rep2["partitions_skipped"] == rep1["partitions_run"]
        assert rep2["sink_counts"] == rep1["sink_counts"]

        # killing one partition's marker reruns exactly that partition
        markers = sorted(os.listdir(os.path.join(out, "_manifest")))
        os.remove(os.path.join(out, "_manifest", markers[0]))
        rc = job_main(["--input", pages_dir, "--output", out,
                       "--num-parts", "3"])
        assert rc == 0
        rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep3["partitions_run"] == 1
        assert rep3["sink_counts"] == rep1["sink_counts"]

    def test_no_input_errors(self, tmp_path, ray_session):
        rc = job_main(["--input", str(tmp_path / "nope"),
                       "--output", str(tmp_path / "o")])
        assert rc == 2
