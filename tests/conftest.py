import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # the reservation-based op resource allocator is the component that
    # (rarely) wedges a very long single session — an executor parks in
    # get_output_blocking with idle actor-pool workers while the
    # allocator believes no budget is free.  The suite runs ~800
    # sequential tiny datasets in ONE 4-CPU session (a shape production
    # never has); fall back to the simpler non-reserving allocator here.
    ctx.op_resource_reservation_enabled = False
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _wedge_watchdog():
    """Per-test stall watchdog: a Ray Data 2.49 streaming executor can
    (rarely, in very long single sessions) park forever in
    ``get_output_blocking`` with idle actor-pool workers.  No test in
    this suite legitimately runs 15 minutes, so dump all stacks and
    kill the process instead of stalling a driver run silently."""
    import faulthandler
    import gc

    faulthandler.dump_traceback_later(900, exit=True)
    yield
    faulthandler.cancel_dump_traceback_later()
    # streaming executors (and the actor-pool resources they reserve)
    # are released on GC; reference cycles through operator topologies
    # otherwise accumulate across hundreds of per-test datasets
    gc.collect()


@pytest.fixture()
def tmp_lake(tmp_path):
    return str(tmp_path / "lake")


@pytest.fixture()
def tmp_wal(tmp_path):
    return str(tmp_path / "wal")
