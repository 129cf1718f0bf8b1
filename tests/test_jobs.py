"""Tests for the $cmd job-launcher layer (ref: utils/parallel/run.pl
contract: JOB=1:N expansion, per-job logs, fail-if-any-failed)."""

import os

import pytest

from kaldi_cnn_tpu.core.jobs import (
    JobFailure, LocalLauncher, QueueLauncher, SerialLauncher,
    run_shell_array, split_even, split_scp)


@pytest.mark.parametrize("launcher", [SerialLauncher(), LocalLauncher(),
                                      LocalLauncher(max_jobs=2),
                                      QueueLauncher(max_jobs_run=3)])
def test_array_results_and_logs(launcher, tmp_path):
    def fn(job):
        print(f"hello from {job}")
        return job * job

    res = launcher.run("sq", 4, fn, log_dir=str(tmp_path))
    assert res == {1: 1, 2: 4, 3: 9, 4: 16}
    for j in range(1, 5):
        text = (tmp_path / f"sq.{j}.log").read_text()
        assert f"hello from {j}" in text
        assert "# Ended (code 0)" in text


def test_failure_semantics(tmp_path):
    def fn(job):
        if job % 2 == 0:
            raise ValueError(f"job {job} boom")
        return job

    with pytest.raises(JobFailure) as ei:
        LocalLauncher().run("boom", 4, fn, log_dir=str(tmp_path))
    assert ei.value.failed == [2, 4]
    assert ei.value.total == 4
    # traceback captured in the failed job's log, code 1 recorded
    log = (tmp_path / "boom.2.log").read_text()
    assert "ValueError" in log and "# Ended (code 1)" in log


def test_no_logdir_still_raises():
    with pytest.raises(JobFailure):
        SerialLauncher().run("x", 2, lambda j: 1 / (j - 1))


def test_shell_array(tmp_path):
    run_shell_array(f"echo shard JOB > {tmp_path}/out.JOB", 3,
                    "sh", str(tmp_path / "log"))
    for j in range(1, 4):
        assert (tmp_path / f"out.{j}").read_text().strip() == f"shard {j}"
        assert "# Ended (code 0)" in (
            tmp_path / "log" / f"sh.{j}.log").read_text()


def test_shell_array_failure(tmp_path):
    with pytest.raises(JobFailure) as ei:
        run_shell_array("test JOB -ne 2", 3, "t", str(tmp_path))
    assert ei.value.failed == [2]


def test_split_even():
    assert split_even(list(range(7)), 3) == [[0, 1, 2], [3, 4], [5, 6]]
    assert split_even([1], 3) == [[1], [], []]
    assert split_even([], 2) == [[], []]


def test_split_scp_preserves_order():
    scp = {f"utt{i:02d}": i for i in range(10)}
    shards = split_scp(scp, 4)
    assert [len(s) for s in shards] == [3, 3, 2, 2]
    merged = {}
    for s in shards:
        merged.update(s)
    assert list(merged) == list(scp)
