"""Checkpoint / resume via orbax.

Replaces the reference's MLflow model logging + fetch-by-URI resume
(train.py:370-372, utils/base.py:249-270): TrainState pytrees are saved
per fold under the run directory; ``--processor_uri`` / ``--classifier_uri``
style resume loads just that sub-tree from a checkpoint path.
"""

import os

import jax
import orbax.checkpoint as ocp


def save_state(state, path):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_state(path, abstract_state):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract_state)


def restore_like(path, state):
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    return restore_state(path, abstract)
