"""One-time TF-CPU train-step baseline for BENCH train metrics.

Builds the flagship 3x/4x spatiotemporal GAN (generator
``spatiotemporal/gen_3x_4x_2f`` + ``spatiotemporal/disc_test``) with
raw TF ops — the reference's compute substrate (reference:
sup3r/models/base.py Sup3rGan on tf.keras) — and times one full
GAN optimization step (gen fwd/bwd + disc fwd/bwd + both Adam
updates) on CPU, exactly what the reference would execute in this
image.  Reports HR voxels/sec so the number is batch-size
independent; bench.py embeds the result as its train baseline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/baseline_tf_train.py [batch] [iters]
"""

import json
import sys
import time

import numpy as np


def build_tf_generator(layers, x):
    """Interpret the generator layer config with raw TF ops and return
    (forward_fn, variables)."""
    import tensorflow as tf

    rng = np.random.default_rng(0)
    variables = []

    def st_expand(z, t_mult, s_mult):
        if t_mult > 1:
            z = tf.repeat(z, t_mult, axis=3)
        if s_mult > 1:
            b_, h, w, t, c = z.shape
            zz = tf.transpose(z, (0, 3, 1, 2, 4))
            zz = tf.reshape(zz, (-1, h, w, c))
            zz = tf.nn.depth_to_space(zz, s_mult)
            zz = tf.reshape(
                zz, (-1, t, h * s_mult, w * s_mult, c // s_mult**2))
            z = tf.transpose(zz, (0, 2, 3, 1, 4))
        return z

    def expand(cfg):
        out = []
        for lay in cfg:
            if 'repeat' in lay:
                out.extend(lay['repeat'] * lay['n'])
            else:
                out.append(lay)
        return out

    layers = expand(layers)

    # instantiate conv weights by shape inference on a dry pass
    plan = []
    z = x
    skips = {}
    for lay in layers:
        cls = lay['class']
        if cls == 'Conv3D':
            cin = int(z.shape[-1])
            k = lay.get('kernel_size', 3)
            f = lay['filters']
            w = tf.Variable(
                (rng.standard_normal((k, k, k, cin, f)) * 0.05)
                .astype(np.float32))
            b = tf.Variable(np.zeros(f, np.float32))
            variables += [w, b]
            strides = [1] + [lay.get('strides', 1)] * 3 + [1]
            pad = lay.get('padding', 'valid').upper()
            plan.append(('conv3d', (w, b, strides, pad)))
            z = tf.nn.conv3d(z, w, strides, pad) + b
        elif cls == 'FlexiblePadding':
            p = lay['paddings']
            plan.append(('pad', (p, lay.get('mode', 'REFLECT'))))
            z = tf.pad(z, p, mode=lay.get('mode', 'REFLECT'))
        elif cls == 'Cropping3D':
            c = lay['cropping']
            plan.append(('crop', c))
            z = z[:, c:-c, c:-c, c:-c, :]
        elif cls == 'LeakyReLU':
            plan.append(('lrelu', lay.get('alpha', 0.2)))
            z = tf.nn.leaky_relu(z, lay.get('alpha', 0.2))
        elif cls == 'SpatioTemporalExpansion':
            t_mult = lay.get('temporal_mult', 1)
            s_mult = lay.get('spatial_mult', 1)
            plan.append(('st_expand', (t_mult, s_mult)))
            z = st_expand(z, t_mult, s_mult)
        elif cls == 'SkipConnection':
            name = lay['name']
            if name in skips:
                plan.append(('skip_add', name))
                z = z + skips.pop(name)
            else:
                plan.append(('skip_save', name))
                skips[name] = z
        else:
            raise ValueError(cls)

    def forward(x):
        import tensorflow as tf

        z = x
        skips = {}
        for op, arg in plan:
            if op == 'conv3d':
                w, b, strides, pad = arg
                z = tf.nn.conv3d(z, w, strides, pad) + b
            elif op == 'pad':
                z = tf.pad(z, arg[0], mode=arg[1])
            elif op == 'crop':
                z = z[:, arg:-arg, arg:-arg, arg:-arg, :]
            elif op == 'lrelu':
                z = tf.nn.leaky_relu(z, arg)
            elif op == 'st_expand':
                z = st_expand(z, *arg)
            elif op == 'skip_save':
                skips[arg] = z
            elif op == 'skip_add':
                z = z + skips.pop(arg)
        return z

    return forward, variables


def build_tf_disc(layers, x):
    """Interpret the discriminator config with raw TF ops."""
    import tensorflow as tf

    rng = np.random.default_rng(1)
    variables = []
    plan = []
    z = x
    for lay in layers:
        cls = lay['class']
        if cls == 'Conv3D':
            cin = int(z.shape[-1])
            k = lay.get('kernel_size', 3)
            f = lay['filters']
            w = tf.Variable(
                (rng.standard_normal((k, k, k, cin, f)) * 0.05)
                .astype(np.float32))
            b = tf.Variable(np.zeros(f, np.float32))
            variables += [w, b]
            strides = [1] + [lay.get('strides', 1)] * 3 + [1]
            pad = lay.get('padding', 'same').upper()
            plan.append(('conv3d', (w, b, strides, pad)))
            z = tf.nn.conv3d(z, w, strides, pad) + b
        elif cls == 'LeakyReLU':
            plan.append(('lrelu', lay.get('alpha', 0.2)))
            z = tf.nn.leaky_relu(z, lay.get('alpha', 0.2))
        elif cls == 'Flatten':
            plan.append(('flatten', None))
            z = tf.reshape(z, (int(z.shape[0]), -1))
        elif cls == 'Dense':
            cin = int(z.shape[-1])
            u = lay['units']
            w = tf.Variable(
                (rng.standard_normal((cin, u)) * 0.02).astype(
                    np.float32))
            b = tf.Variable(np.zeros(u, np.float32))
            variables += [w, b]
            plan.append(('dense', (w, b)))
            z = z @ w + b
        else:
            raise ValueError(cls)

    def forward(x):
        import tensorflow as tf

        z = x
        for op, arg in plan:
            if op == 'conv3d':
                w, b, strides, pad = arg
                z = tf.nn.conv3d(z, w, strides, pad) + b
            elif op == 'lrelu':
                z = tf.nn.leaky_relu(z, arg)
            elif op == 'flatten':
                z = tf.reshape(z, (tf.shape(z)[0], -1))
            elif op == 'dense':
                w, b = arg
                z = z @ w + b
        return z

    return forward, variables


def main(batch=4, iters=2):
    import tensorflow as tf

    from sup3r_tpu.configs import get_config

    tf.config.threading.set_intra_op_parallelism_threads(0)
    gen_cfg = get_config('spatiotemporal/gen_3x_4x_2f')['hidden_layers']
    disc_cfg = get_config('spatiotemporal/disc_test')['hidden_layers']

    lr_shape = (batch, 12, 12, 12, 2)
    hr_shape = (batch, 36, 36, 48, 2)
    rng = np.random.default_rng(0)
    lr = tf.constant(rng.random(lr_shape).astype(np.float32))
    hr = tf.constant(rng.random(hr_shape).astype(np.float32))

    gen_fwd, gen_vars = build_tf_generator(gen_cfg, lr)
    disc_fwd, disc_vars = build_tf_disc(disc_cfg, hr)
    gen_opt = tf.keras.optimizers.Adam(1e-4)
    disc_opt = tf.keras.optimizers.Adam(1e-4)

    @tf.function
    def train_step(lr, hr):
        with tf.GradientTape(persistent=True) as tape:
            fake = gen_fwd(lr)
            d_true = disc_fwd(hr)
            d_fake = disc_fwd(fake)
            content = tf.reduce_mean((fake - hr) ** 2)
            advers = tf.reduce_mean(
                tf.nn.sigmoid_cross_entropy_with_logits(
                    labels=tf.ones_like(d_fake), logits=d_fake))
            gen_loss = content + 1e-3 * advers
            disc_loss = tf.reduce_mean(
                tf.nn.sigmoid_cross_entropy_with_logits(
                    labels=tf.ones_like(d_true), logits=d_true)
                + tf.nn.sigmoid_cross_entropy_with_logits(
                    labels=tf.zeros_like(d_fake), logits=d_fake))
        g_grads = tape.gradient(gen_loss, gen_vars)
        d_grads = tape.gradient(disc_loss, disc_vars)
        gen_opt.apply_gradients(zip(g_grads, gen_vars))
        disc_opt.apply_gradients(zip(d_grads, disc_vars))
        return gen_loss, disc_loss

    t0 = time.perf_counter()
    gl, dl = train_step(lr, hr)
    print(f'warmup (compile+step): {time.perf_counter() - t0:.1f}s '
          f'gen_loss={float(gl):.4f} disc_loss={float(dl):.4f}',
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        gl, dl = train_step(lr, hr)
    float(gl)
    dt = (time.perf_counter() - t0) / iters
    voxels = int(np.prod(hr_shape[:-1]))
    print(json.dumps({
        'metric': 'tf_cpu_train_step_hr_voxels_per_sec',
        'value': round(voxels / dt, 1),
        'unit': 'voxels/s',
        'batch': batch,
        'step_seconds': round(dt, 2),
    }))


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
