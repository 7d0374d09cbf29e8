"""Microbench upsample+conv formulations at the up_2 shape on the real chip."""
import time
import jax, jax.numpy as jnp
import numpy as np

B, H, C, F = 512, 16, 256, 256


def timed(fn, x, W3, b, n=30):
    @jax.jit
    def run(x, W3, b):
        def body(c, _):
            y = fn(c, W3, b)
            # fold back to input shape so the loop chains (avg-pool 2x)
            y = y.reshape(B, H, 2, H, 2, F).mean(axis=(2, 4)).astype(c.dtype)
            return y, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(jax.device_get(run(x, W3, b)))
    t0 = time.perf_counter()
    float(jax.device_get(run(x, W3, b)))
    return (time.perf_counter() - t0) / n


def naive(x, W3, b):
    up = jax.image.resize(x, (B, H * 2, H * 2, C), method="nearest")
    return jax.lax.conv_general_dilated(
        up, W3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def _parity_kernels(W3, dtype):
    A0 = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])
    A1 = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    ks = [
        jnp.einsum("rj,sk,jkcf->rscf", Aa, Ab, W3.astype(jnp.float32))
        for Aa in (A0, A1) for Ab in (A0, A1)
    ]
    return jnp.concatenate(ks, axis=-1).astype(dtype)


def parity(x, W3, b):
    K = _parity_kernels(W3, x.dtype)
    y = jax.lax.conv_general_dilated(
        x, K, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4F)
    y00 = y[:, :H, :H, 0 * F:1 * F]
    y01 = y[:, :H, 1:, 1 * F:2 * F]
    y10 = y[:, 1:, :H, 2 * F:3 * F]
    y11 = y[:, 1:, 1:, 3 * F:4 * F]
    out = jnp.stack(
        [jnp.stack([y00, y01], axis=3), jnp.stack([y10, y11], axis=3)], axis=2
    ).reshape(B, 2 * H, 2 * H, F)
    return out + b


def dilated(x, W3, b):
    # nearest-up == zero-stuff then convolve with ones(2,2); fold that into
    # the kernel: W4[u, v] = sum_{dy,dx in 0..1} W3 at (u-dy, v-dx)
    W4 = jnp.zeros((4, 4) + W3.shape[2:], jnp.float32)
    w = W3.astype(jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            W4 = W4.at[dy:dy + 3, dx:dx + 3].add(w)
    W4 = W4.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, W4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def main():
    global B, H, C, F
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.bfloat16)
    W3 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, F), jnp.bfloat16) * 0.02
    b = jnp.zeros((F,), jnp.bfloat16)

    # numeric check on small input
    xs = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16), jnp.float32)
    Ws = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 8), jnp.float32)
    bs = jnp.zeros((8,), jnp.float32)
    B0, H0, C0, F0 = B, H, C, F
    B, H, C, F = 2, 8, 16, 8
    yn, yp, yd = naive(xs, Ws, bs), parity(xs, Ws, bs), dilated(xs, Ws, bs)
    print("parity err", float(jnp.abs(yp - yn).max()),
          "dilated err", float(jnp.abs(yd - yn).max()))
    B, H, C, F = B0, H0, C0, F0

    for name, fn in (("naive", naive), ("parity", parity), ("dilated", dilated)):
        dt = timed(fn, x, W3, b)
        print(f"{name}: {dt*1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
