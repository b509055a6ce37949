"""Labor: worker daemon that attaches to the scheduler.

Re-design of the reference Labor (reference distributed/labor/Labor.cpp).
The reference labor was the compute worker: it received the full dataset
and fixed factors over TCP and solved 10k-row buckets (Labor.cpp:197-405).
In the TPU design the compute workers are accelerator chips driven by SPMD
programs; a *labor process* is a per-host agent whose jobs are:

- liveness: attach (kAttachLabor analog, Labor.cpp:105-143) and answer
  heartbeats with its local (taskid, epoch) (kInfoRsp, Labor.cpp:179-195);
- task sync: record task announcements so a multi-host run can join the
  right jax.distributed rendezvous (the kPushRate/kPushFixed guards,
  Labor.cpp:245-346, collapse into this: data sync is the accelerator
  runtime's job now);
- elasticity: labors may attach/detach at any time, mirroring the
  reference's any-time kAttachLabor semantics.
"""

from __future__ import annotations

import asyncio
from typing import Any, Dict, Optional

from qmf_tpu.distributed import protocol
from qmf_tpu.utils.logging import log


class Labor:
    def __init__(self, host: str = "127.0.0.1", port: int = 8900):
        self.host = host
        self.port = port
        self.taskid = 0
        self.epoch = 0
        self.attached = False
        self.current_task: Optional[Dict[str, Any]] = None

    async def run(self) -> None:
        """Connect, attach, then serve heartbeats/announcements forever."""
        reader, writer = await asyncio.open_connection(self.host, self.port)
        try:
            await protocol.write_frame(writer, {"kind": "attach_labor"})
            rsp = await protocol.read_frame(reader)
            if not rsp or rsp.get("status") != "OK":
                raise RuntimeError(f"attach failed: {rsp}")
            self.attached = True
            log.info("attached to scheduler %s:%d as %s", self.host,
                     self.port, rsp.get("peer"))
            while True:
                msg = await protocol.read_frame(reader)
                if msg is None:
                    log.warning("scheduler connection closed")
                    return
                reply = self._dispatch(msg)
                if reply is not None:
                    await protocol.write_frame(writer, reply)
        finally:
            self.attached = False
            writer.close()

    def _dispatch(self, msg: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        kind = msg.get("kind")
        if kind == "heartbeat":
            # kInfoRsp analog: report local task/epoch state
            return {
                "kind": "info_rsp",
                "taskid": self.taskid,
                "epoch": self.epoch,
            }
        if kind == "task_announce":
            self.taskid = msg.get("taskid", 0)
            self.epoch = 0
            self.current_task = msg.get("task")
            log.info("task %d announced", self.taskid)
            return None
        return None
