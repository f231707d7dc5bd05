"""Batch-axis SPMD wrapping for Pallas kernels.

pallas_call has no automatic partitioning rule, so a kernel invoked inside
a jit with sharded operands would fail to partition.  Every kernel in this
package is batch-parallel (grid dim 0 = sample; no cross-sample reads), so
the correct SPMD treatment is universal: shard axis 0 of the batched
operands over the mesh, replicate the weight/constant operands, and run
the unmodified kernel on each device's local shard.

``batch_partitioned`` builds that wrapper with jax's custom_partitioning:
a Shardy einsum-like rule (every non-batch factor marked
need-replication) plus the legacy GSPMD callbacks, with the result
sharded like the first batched operand.  Single-device jit passes
through unchanged (tests/test_sharded_kernels.py pins exact equality).
"""

from __future__ import annotations

from collections.abc import Sequence


def batch_partitioned(fn, batched: Sequence[bool], out_rank: int):
    """Wrap ``fn(*arrays) -> array`` for batch-axis SPMD.

    batched: per-positional-arg flag — True if axis 0 is the sample axis
      (sharded), False for replicated operands (weights, constants).
    out_rank: rank of the result; its axis 0 is the sample axis.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def call(*args):
        if len(args) != len(batched):
            raise ValueError(
                f"batch_partitioned: expected {len(batched)} args, got "
                f"{len(args)}")
        terms, rep = [], []
        cnt = 0
        for a, isb in zip(args, batched):
            fs = []
            for ax in range(a.ndim):
                if ax == 0 and isb:
                    fs.append("n")
                else:
                    f = f"f{cnt}"
                    cnt += 1
                    fs.append(f)
                    rep.append(f)
            terms.append(" ".join(fs))
        # every kernel here returns an array shaped like its first operand
        # (the batched activation), so the output reuses its factors
        if out_rank != args[0].ndim or not batched[0]:
            raise ValueError("output must be shaped like batched arg 0")
        rule = ", ".join(terms) + " -> " + terms[0]

        def _spec(mesh, arg_shapes):
            b = None
            for info, isb in zip(arg_shapes, batched):
                if not isb:
                    continue
                try:
                    spec = info.sharding.spec
                    b = spec[0] if len(spec) else None
                except (AttributeError, IndexError):
                    b = None
                break
            return b

        def infer(mesh, arg_shapes, result_shape):
            b = _spec(mesh, arg_shapes)
            return NamedSharding(
                mesh, PartitionSpec(b, *([None] * (out_rank - 1))))

        def partition(mesh, arg_shapes, result_shape):
            b = _spec(mesh, arg_shapes)
            arg_sh = tuple(
                NamedSharding(
                    mesh,
                    PartitionSpec(b if isb else None,
                                  *([None] * (len(info.shape) - 1))))
                for info, isb in zip(arg_shapes, batched))
            out_sh = NamedSharding(
                mesh, PartitionSpec(b, *([None] * (out_rank - 1))))
            return mesh, fn, out_sh, arg_sh

        cp = custom_partitioning(fn)
        cp.def_partition(
            partition,
            infer_sharding_from_operands=infer,
            sharding_rule=rule,
            need_replication_factors=tuple(dict.fromkeys(rep)),
        )
        return cp(*args)

    return call
