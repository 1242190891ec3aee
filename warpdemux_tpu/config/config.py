"""Top-level run configuration (reference warpdemux/config/config.py:19-26 +
config/file_proc.py): input/output/batch/task aggregation, run-dir layout,
and the command.json resume manifest."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, asdict
from pathlib import Path

from warpdemux_tpu.config.sig_proc import SigProcConfig


@dataclass
class InputConfig:
    files: list = field(default_factory=list)
    read_ids_incl: set = field(default_factory=set)
    read_ids_excl: set = field(default_factory=set)
    continue_from: str = ""


@dataclass
class OutputConfig:
    output_dir: str = ""
    save_fpts: bool = False
    save_dwell_time: bool = False
    save_boundaries: bool = False
    save_predictions: bool = True

    output_subdir_pred: str = "predictions"
    output_subdir_fail: str = "failed_reads"
    output_subdir_fpts: str = "fingerprints"
    output_subdir_boundaries: str = "boundaries"
    # multi-host runs tag every shard file name (e.g. "h001_") so hosts
    # sharing a filesystem never collide (parallel/multihost.host_shard_tag)
    shard_tag: str = ""

    def __post_init__(self):
        o = self.output_dir
        self.output_dir_pred = os.path.join(o, self.output_subdir_pred)
        self.output_dir_fail = os.path.join(o, self.output_subdir_fail)
        self.output_dir_fpts = os.path.join(o, self.output_subdir_fpts)
        self.output_dir_boundaries = os.path.join(
            o, self.output_subdir_boundaries
        )
        if o:
            os.makedirs(o, exist_ok=True)
            os.makedirs(self.output_dir_fail, exist_ok=True)
            if self.save_predictions:
                os.makedirs(self.output_dir_pred, exist_ok=True)
            if self.save_boundaries:
                os.makedirs(self.output_dir_boundaries, exist_ok=True)
            if self.save_fpts:
                os.makedirs(self.output_dir_fpts, exist_ok=True)


@dataclass
class BatchConfig:
    minibatch_size: int = 1000
    batch_size_output: int = 40000
    bidx_pass: int = 0
    bidx_fail: int = 0
    bidx_predict: int = 0
    # devices to shard each minibatch over (the reference's `-j` reads-
    # parallelism, file_proc.py:1197-1245, mapped onto a jax Mesh):
    # 1 = single device, 0 = all local devices, N = first N devices.
    devices: int = 1
    # host->device wire format: "vbz" ships the compressed pod5 inner
    # layout (~11.5 KB/read, decoded on device — wins on thin links);
    # "adc" ships raw int16 counts (20 KB/read, zero device decode — wins
    # on locally attached accelerators).
    wire: str = "vbz"
    # two-stage adaptive preload for predictions-only vbz runs: ship only
    # the first stage1_preload samples per read, re-ship tails solely for
    # reads whose decision provably needs them (bit-identical decisions;
    # pipeline/step.py make_twostage_decision_step). 0 disables. Applied
    # when the run uses the decision lane on a single device.
    stage1_preload: int = 7168


@dataclass
class TaskConfig:
    command: str = "demux"
    preprocess: bool = True
    predict: bool = True


@dataclass
class ClassifConfig:
    model_name: str = ""


@dataclass
class Config:
    input: InputConfig
    output: OutputConfig
    batch: BatchConfig
    task: TaskConfig
    classif: ClassifConfig
    sig_proc: SigProcConfig

    def write_command_json(self, argv: list[str]) -> None:
        """Persist the run manifest for `continue`/`predict`
        (reference parser.py:529-536)."""
        path = Path(self.output.output_dir) / "command.json"
        payload = {
            "command": self.task.command,
            "argv": argv,
            "model_name": self.classif.model_name,
            "output_dir": self.output.output_dir,
            "input_files": list(self.input.files),
            "batch": {
                "minibatch_size": self.batch.minibatch_size,
                "batch_size_output": self.batch.batch_size_output,
                "devices": self.batch.devices,
                "wire": self.batch.wire,
            },
            "output": {
                "save_fpts": self.output.save_fpts,
                "save_boundaries": self.output.save_boundaries,
                "save_dwell_time": self.output.save_dwell_time,
            },
        }
        path.write_text(json.dumps(payload, indent=2))

    @staticmethod
    def read_command_json(run_dir: str) -> dict:
        path = Path(run_dir) / "command.json"
        if not path.exists():
            raise FileNotFoundError(
                f"no command.json in {run_dir}; not a previous run directory"
            )
        return json.loads(path.read_text())
