"""``wals_scheduler`` CLI (reference qmf/wals_scheduler.cpp:27-75).

Starts the job-queue scheduler daemon. Same default bind (0.0.0.0:8900) and
flag names as the reference.
"""

from __future__ import annotations

import asyncio
import signal
import sys

from qmf_tpu.cli.common import configure_platform, enable_compilation_cache
from qmf_tpu.distributed.scheduler import Scheduler
from qmf_tpu.utils.flags import Flags
from qmf_tpu.utils.logging import log


def make_flags() -> Flags:
    fl = Flags("wals_scheduler")
    fl.define_string("scheduler_ip", "0.0.0.0", "scheduler bind address")
    fl.define_integer("scheduler_port", 8900, "scheduler bind port")
    # multi-process training over attached labors (jax.distributed)
    fl.define_bool(
        "multiproc",
        True,
        "co-train across attached labors via a jax.distributed rendezvous",
    )
    fl.define_string(
        "coordinator_ip",
        "127.0.0.1",
        "address labors use to reach this host's jax.distributed coordinator",
    )
    fl.define_integer(
        "n_local_devices",
        0,
        "force N virtual CPU devices per worker process (0 = native platform)",
    )
    return fl


def main(argv=None) -> int:
    fl = make_flags()
    fl.parse(argv)
    configure_platform()
    enable_compilation_cache()
    scheduler = Scheduler(
        fl.scheduler_ip,
        fl.scheduler_port,
        multiproc=fl.multiproc,
        coordinator_host=fl.coordinator_ip,
        n_local_devices=fl.n_local_devices,
    )

    async def _run():
        loop = asyncio.get_running_loop()
        stop = asyncio.Event()
        for sig in (signal.SIGINT, signal.SIGTERM, signal.SIGUSR1):
            loop.add_signal_handler(sig, stop.set)
        await scheduler.start()
        log.info("scheduler ready; submit tasks with wals_submit")
        await stop.wait()
        log.info("signal received, terminating...")
        await scheduler.stop()

    asyncio.run(_run())
    return 0


if __name__ == "__main__":
    sys.exit(main())
