import time
import jax, numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# physical table: [G, 8, 384] f32  (G super-groups of 8 physical rows;
# each physical row = 8 logical rows x 48 combined cols)
G = 406_252            # ~26M logical rows / 64
W = 384
table = jax.jit(lambda: jnp.zeros((G, 8, W), jnp.float32))()

N = 106_496            # touched logical rows -> ~93k unique super-groups
rng = np.random.default_rng(0)
sgids_np = np.sort(rng.choice(G, 98_304, replace=False)).astype(np.int32)  # 96k groups, mult of 4096*?
NS = len(sgids_np)
SUB, LANE = 8, 64
CHUNK = SUB * LANE     # 4096 super-groups per grid step
assert NS % CHUNK == 0, NS
sgids = jnp.asarray(sgids_np).reshape(NS // CHUNK * SUB, LANE)

def kernel(gid_ref, tbl_ref, out_ref, buf, sem_in, sem_out):
    def pull(i, _):
        rid = gid_ref[i // LANE, i % LANE]
        pltpu.make_async_copy(out_ref.at[rid], buf.at[i], sem_in).start()
        return 0
    def pull_wait(i, _):
        rid = gid_ref[i // LANE, i % LANE]
        pltpu.make_async_copy(out_ref.at[rid], buf.at[i], sem_in).wait()
        return 0
    jax.lax.fori_loop(0, CHUNK, pull, 0)
    jax.lax.fori_loop(0, CHUNK, pull_wait, 0)
    buf[:] = buf[:] * 0.999 + 0.001      # stand-in for the adam math
    def push(i, _):
        rid = gid_ref[i // LANE, i % LANE]
        pltpu.make_async_copy(buf.at[i], out_ref.at[rid], sem_out).start()
        return 0
    def push_wait(i, _):
        rid = gid_ref[i // LANE, i % LANE]
        pltpu.make_async_copy(buf.at[i], out_ref.at[rid], sem_out).wait()
        return 0
    jax.lax.fori_loop(0, CHUNK, push, 0)
    jax.lax.fori_loop(0, CHUNK, push_wait, 0)

fn = pl.pallas_call(
    kernel,
    grid=(NS // CHUNK,),
    in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                           memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((G, 8, W), jnp.float32),
    scratch_shapes=[pltpu.VMEM((CHUNK, 8, W), jnp.float32),
                    pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    input_output_aliases={1: 0},
    compiler_params=pltpu.CompilerParams(has_side_effects=True),
)
out = fn(sgids, table)
jax.block_until_ready(out)
v = float(out[sgids_np[0], 0, 0])
print('correct:', abs(v - 0.001) < 1e-6, v)

REPS = 30
def run(t_):
    def body(i, acc):
        return fn(sgids, acc)
    return jax.lax.fori_loop(0, REPS, body, t_)
f = jax.jit(run, donate_argnums=(0,))
t2 = jax.jit(lambda: jnp.zeros((G, 8, W), jnp.float32))()
out = f(t2); jax.block_until_ready(out)
t3 = jax.jit(lambda: jnp.zeros((G, 8, W), jnp.float32))()
t = time.time(); out = f(t3); jax.block_until_ready(out); _ = float(out[0,0,0])
print('pallas supergroup RMW: %.2f ms/op (96k groups, 2.4GB moved)' % ((time.time()-t)/REPS*1000))
