"""Experiment tracking: local filesystem runs (MLflow-compatible layout).

The reference logs everything to a remote MLflow server
(train.py:132-147,322-347). This environment has no egress and no mlflow
package, so runs are tracked locally under ``results/runs/<experiment>/
<run_name>/`` with the same artifact structure the figures/AB tooling
expects: params.json, metrics.jsonl, state_dict.json, checkpoints/,
results/ (stage artifacts). If MLFLOW_TRACKING_URI is set, runs are
mirrored to the tracking server too — through the mlflow package when
importable, else by speaking the server's REST API 2.0 directly
(tracking/mlflow_rest.py, stdlib-only; exercised against an in-process
protocol server in tests/test_tracking_mlflow.py).
"""

import json
import os
import time
from typing import Optional

import numpy as np


def _to_jsonable(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (list, tuple)):
        return [_to_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_jsonable(x) for k, x in v.items()}
    return v


class Run:
    def __init__(self, experiment_name: str, run_name: str,
                 root: str = "results/runs", parent: Optional["Run"] = None,
                 tracking_uri: Optional[str] = None):
        self.experiment_name = experiment_name
        self.run_name = run_name
        if parent is not None:
            self.dir = os.path.join(parent.dir, _safe(run_name))
        else:
            self.dir = os.path.join(root, _safe(experiment_name),
                                    _safe(run_name))
        os.makedirs(self.dir, exist_ok=True)
        # metrics file opened lazily so read-only access (find_run,
        # get_model_by_name) has no write side effects
        self._metrics_fh = None
        self._mlflow = self._mlflow_run = None
        uri = tracking_uri or os.environ.get("MLFLOW_TRACKING_URI")
        self._tracking_uri = uri
        if uri:
            try:
                import mlflow
                mlflow.set_tracking_uri(uri)
                mlflow.set_experiment(experiment_name)
                self._mlflow_run = mlflow.start_run(
                    run_name=run_name, nested=parent is not None)
                self._mlflow = mlflow
            except ImportError:
                # package absent: speak the tracking server's REST API
                # directly (tracking/mlflow_rest.py) for http(s) URIs
                if uri.startswith(("http://", "https://")):
                    try:
                        from .mlflow_rest import RestMirror
                        parent_mirror = (parent._mlflow
                                         if parent is not None else None)
                        self._mlflow = RestMirror.start(
                            uri, experiment_name, run_name,
                            parent_run_id=getattr(parent_mirror, "run_id",
                                                  None))
                        self._mlflow_run = self._mlflow
                    except Exception as e:  # noqa: BLE001
                        print(f"mlflow REST mirror unavailable ({e}); "
                              "tracking locally")
                else:
                    print("mlflow not installed — tracking locally only "
                          f"(requested URI {uri})")
            except Exception as e:  # noqa: BLE001 — never block training
                print(f"mlflow mirror unavailable ({e}); tracking locally")

    def log_params(self, params: dict):
        path = os.path.join(self.dir, "params.json")
        merged = {}
        if os.path.exists(path):
            with open(path) as fh:
                merged = json.load(fh)
        merged.update(_to_jsonable(params))
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=2, default=str)
        if self._mlflow is not None:
            try:
                self._mlflow.log_params({k: str(v)[:250]
                                         for k, v in merged.items()})
            except Exception:  # noqa: BLE001
                pass

    def log_metrics(self, metrics: dict, step: Optional[int] = None):
        rec = {"time": time.time(), "step": step}
        rec.update({k: _to_jsonable(v) for k, v in metrics.items()})
        if self._metrics_fh is None:
            self._metrics_fh = open(
                os.path.join(self.dir, "metrics.jsonl"), "a")
        self._metrics_fh.write(json.dumps(rec, default=str) + "\n")
        self._metrics_fh.flush()
        if self._mlflow is not None:
            try:
                self._mlflow.log_metrics(
                    {k: float(v) for k, v in metrics.items()
                     if isinstance(v, (int, float, np.floating, np.integer))},
                    step=step)
            except Exception:  # noqa: BLE001
                pass

    def log_state_dict(self, state_dict: dict, name="state_dict.json"):
        with open(os.path.join(self.dir, name), "w") as fh:
            json.dump(_to_jsonable(state_dict), fh, indent=2, default=str)

    def artifact_dir(self, *parts):
        d = os.path.join(self.dir, *parts)
        os.makedirs(d, exist_ok=True)
        return d

    def child(self, run_name: str) -> "Run":
        """Nested run (the reference's per-fold child runs, train.py:322).

        Forwards the resolved tracking URI so a mirror enabled via the
        --tracking_uri flag (not the env var) also mirrors the per-fold
        children where the train/val metrics actually land."""
        return Run(self.experiment_name, run_name, parent=self,
                   tracking_uri=self._tracking_uri)

    def close(self):
        if self._metrics_fh is not None:
            self._metrics_fh.close()
            self._metrics_fh = None
        if self._mlflow is not None and self._mlflow_run is not None:
            try:
                self._mlflow.end_run()
            except Exception:  # noqa: BLE001
                pass
            self._mlflow_run = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def read_metrics(self):
        path = os.path.join(self.dir, "metrics.jsonl")
        out = []
        if os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    out.append(json.loads(line))
        return out


def _safe(s):
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in s)


def start_run(experiment_name, run_name, **kw):
    return Run(experiment_name, run_name, **kw)


def find_run(experiment_name, run_name, root="results/runs"):
    d = os.path.join(root, _safe(experiment_name), _safe(run_name))
    if not os.path.isdir(d):
        raise FileNotFoundError(f"run not found: {d}")
    return Run(experiment_name, run_name, root=root)


def list_runs(experiment_name, root="results/runs"):
    """All run names recorded under an experiment, sorted (the local
    equivalent of fetch_runs_list_mlflow, utils/base.py:243-246 —
    mlflow.search_runs over the experiment id)."""
    d = os.path.join(root, _safe(experiment_name))
    if not os.path.isdir(d):
        raise FileNotFoundError(f"experiment not found: {d}")
    return sorted(name for name in os.listdir(d)
                  if os.path.isdir(os.path.join(d, name)))


def get_model_by_name(experiment_name, run_name, root="results/runs",
                      fold=0):
    """Locate a run's per-component checkpoints + state dict by names
    (the local equivalent of get_mlflow_model_by_name,
    utils/base.py:190-229). Checkpoints live in the per-fold CHILD run
    (run_name_<k>); pass the parent name + fold, or the child name directly.

    Returns (state_dict, {"processor": path-or-None, "classifier": path}).
    """
    run = find_run(experiment_name, run_name, root=root)
    child = os.path.join(run.dir, f"{run_name}_{fold}")
    if (not os.path.isdir(os.path.join(run.dir, "checkpoints"))
            and os.path.isdir(child)):
        run.dir = child
    sd_path = os.path.join(run.dir, "state_dict.json")
    state_dict = {}
    if os.path.exists(sd_path):
        with open(sd_path) as fh:
            state_dict = json.load(fh)
    ckpts = {}
    for comp in ("processor", "classifier"):
        path = os.path.join(run.dir, "checkpoints", comp)
        ckpts[comp] = path if os.path.isdir(path) else None
    return state_dict, ckpts


def display_run_info(run):
    """Print where a run's artifacts live (display_mlflow_run_info analog,
    utils/base.py:273-289)."""
    print(f"experiment '{run.experiment_name}' > run '{run.run_name}'")
    print(f"artifacts at {os.path.abspath(run.dir)}")
