import os, sys
if sys.argv[2] == 'cpu':
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax; jax.config.update('jax_platforms', 'cpu')
    assert jax.devices()[0].platform == 'cpu'
else:
    import jax
    assert jax.devices()[0].platform != 'cpu', jax.devices()
from hhsuite_tpu.tools.tpu_check import oracle_outputs
outs = oracle_outputs()
with open(sys.argv[1], 'w') as f:
    for k in ('m8', 'hhr', 'm8_n2', 'hhr_n2'):
        f.write(outs[k]); f.write('\n=====\n')
