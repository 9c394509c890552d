"""orbax-backed sharded solver checkpoints (async, per-shard parallel IO).

The npz backend in core/incore.py all-gathers the iterate to one host and
writes a single archive -- fine for small states, but a production-scale
sharded state (multi-host mesh, O(10^6-10^7) cells x modules; the scale the
reference targets, /root/reference/docs/source/description/background.rst:5-18)
would funnel through one process and stall the solve for the duration of the
write.  This backend keeps the reference's resume semantics (SURVEY P3:
nk_ooc/solver_state.py step-log resume for preemptible execution) with
TPU-native mechanics:

  * each process writes only its addressable shards (orbax/tensorstore),
  * saves are asynchronous -- the Newton loop continues on device while the
    previous snapshot commits in the background,
  * commits are atomic: a step directory is finalized only after every
    process completes, so a preempted VM never resumes from a torn write
    (the npz path gets the same guarantee from its temp+rename, but only
    single-writer),
  * restore materializes shards directly into the live mesh sharding -- no
    host-gather round trip and no silent replicated fallback.

Multi-process meshes require ``directory`` to be shared storage visible to
every process -- the same contract as the file-backed solver's workdir and
the npz checkpoint path.
"""

from __future__ import annotations

import logging
import os


class SolverCheckpointer:
    """async sharded snapshots of an in-core solver iterate

    One snapshot per Newton iteration, keyed by iteration number; only the
    most recent ``max_to_keep`` are retained.  Use as a context manager (or
    call :meth:`close`) so the final async commit is awaited before the
    process exits.
    """

    def __init__(self, directory, max_to_keep=2):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, iteration, x):
        """queue an async snapshot of the iterate at this Newton iteration

        Returns immediately once the device buffers are staged; the write
        itself overlaps the next Newton iteration's device work.
        """
        self._mgr.save(iteration, args=self._ocp.args.StandardSave({"x": x}))

    def restore_latest(self, x_like, sharding=None):
        """load the newest committed snapshot, or None if there is none

        x_like supplies shape/dtype; ``sharding`` (a NamedSharding) places
        the restored shards straight onto the mesh.  Returns
        ``(x, iteration)``.
        """
        import jax

        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.ShapeDtypeStruct(
            x_like.shape, x_like.dtype, sharding=sharding
        )
        restored = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore({"x": abstract})
        )
        logging.getLogger(__name__).info(
            "restored orbax checkpoint at iteration %d", step
        )
        return restored["x"], int(step)

    def close(self):
        """await in-flight async commits and release the manager"""
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
