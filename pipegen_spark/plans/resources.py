"""Run-scoped resource naming (reference B14,
internal/pipeline/resources.go:52-126): fixed `pipegen-local` prefix in
local mode, `pipegen-<timestamp>-<uuid8>` otherwise; input/output resolve
to the first/last declared topic. Topics become paths/checkpoint dirs in
file mode."""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone


@dataclass
class PipelineResources:
    prefix: str
    input_topic: str
    output_topic: str
    topics: list[str] = field(default_factory=list)
    workdir: str = ""

    def checkpoint_dir(self, name: str) -> str:
        return os.path.join(self.workdir, "checkpoints", name)

    def output_dir(self, topic: str) -> str:
        return os.path.join(self.workdir, "topics", topic)


def generate_resources(
    topics: list[str],
    workdir: str,
    local_mode: bool = True,
) -> PipelineResources:
    if local_mode:
        prefix = "pipegen-local"
    else:
        ts = datetime.now(timezone.utc).strftime("%Y%m%d%H%M%S")
        prefix = f"pipegen-{ts}-{uuid.uuid4().hex[:8]}"
    if not topics:
        topics = [f"{prefix}-input", f"{prefix}-output"]
    return PipelineResources(
        prefix=prefix,
        input_topic=topics[0],
        output_topic=topics[-1],
        topics=list(topics),
        workdir=workdir,
    )
