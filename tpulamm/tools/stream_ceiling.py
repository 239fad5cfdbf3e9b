"""Measure the chip's PRACTICAL HBM streaming ceiling.

The decode roofline (tools/decode_roofline.py) scores each op against the
nominal 819 GB/s v5e HBM peak, but no real kernel reaches nominal. This
probe measures the best rate an embarrassingly-streamable Pallas kernel
(block-wise reduce of a multi-GB buffer — one read per byte, no writes
that matter, trivial compute) actually achieves, for several block sizes.

The whole-decode-step effective bandwidth (4.40 GB / step time) should be
judged against THIS number, not nominal: if the step streams at ~90% of
the probe ceiling, per-op tile tuning is exhausted and only fewer bytes
(format) or amortization (batching/speculation) can raise decode t/s.

Usage: python -m tpulamm.tools.stream_ceiling [gb]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_reduce(total_rows: int, cols: int, block_rows: int):
    n_blocks = total_rows // block_rows

    def kernel(b_ref, x_ref, o_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref) + b_ref[0, 0]
        o_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)

    def run(b, x):
        # b: (1,1) f32 loop-carried perturbation — makes the call
        # hoist-proof inside lax.scan WITHOUT copying x (an x.at[...]
        # perturbation would add a full-buffer copy to every iteration
        # and measure copy+read, not the read stream).
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, cols), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, cols), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(b, x)
    return run


def main():
    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    cols = 1024
    dt = jnp.float32
    # round to a multiple of the LARGEST probed block_rows (2048) so
    # n_blocks = total_rows // block_rows is exact for every probe and
    # nbytes matches what the kernel actually reads (advisor r4)
    total_rows = int(gb * 2**30 / (cols * 4) // 2048 * 2048)
    nbytes = total_rows * cols * 4
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(total_rows, cols)),
        dt)
    print(f"buffer {nbytes / 2**30:.2f} GiB f32 ({total_rows}x{cols})",
          flush=True)
    for block_rows in (512, 1024, 2048):
        run = make_reduce(total_rows, cols, block_rows)

        # hoist-proof scan slope (bench.py method): perturb x each
        # iteration so the pallas_call cannot be hoisted out of the loop;
        # the tunneled transport also lies on isolated dispatch timing.
        def make_loop(n_it, run=run):
            @jax.jit
            def loop(xin):
                def body(c, _):
                    b = (c * jnp.float32(1e-20)).reshape(1, 1)
                    return run(b, xin)[0, 0], ()
                c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=n_it)
                return c
            return loop

        try:
            l1, l2 = make_loop(3), make_loop(13)
            l1(x).block_until_ready()
            l2(x).block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"block_rows={block_rows}: FAIL "
                  f"{str(e).splitlines()[0][:80]}", flush=True)
            continue

        def timed(loop):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            return time.perf_counter() - t0

        slopes = sorted(timed(l2) - timed(l1) for _ in range(5))
        t = slopes[len(slopes) // 2] / 10
        blk_mb = block_rows * cols * 4 / 2**20
        if t <= 0:
            # timing noise can push a pair-slope median non-positive on a
            # loaded host; a negative GB/s figure is garbage (advisor r4)
            print(f"block_rows={block_rows} ({blk_mb:.0f}MB/step): noisy "
                  f"(non-positive slope), skipped", flush=True)
            continue
        print(f"block_rows={block_rows} ({blk_mb:.0f}MB/step): "
              f"{t * 1e3:.2f} ms  {nbytes / t / 1e9:.0f} GB/s "
              f"({nbytes / t / 819e9 * 100:.0f}% of nominal)", flush=True)


if __name__ == "__main__":
    main()
