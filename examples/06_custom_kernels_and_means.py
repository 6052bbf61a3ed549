"""Custom kernels and mean functions
(mirrors examples/06_Custom_Kernels_and_Mean_Functions.ipynb)."""
import numpy as np
import jax.numpy as jnp
import mogptk_tpu as mogptk
from mogptk_tpu import gpr


class BrownianKernel(gpr.Kernel):
    """k(x,x') = sigma^2 min(x, x') — a custom user kernel."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.magnitude = gpr.Parameter(1.0, lower=gpr.config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        if X2 is None:
            X2 = X1
        return self.magnitude() * jnp.minimum(X1[:, None, 0], X2[None, :, 0])


t = np.linspace(0.01, 5, 60)
rng = np.random.RandomState(0)
y = np.cumsum(0.3 * rng.randn(len(t))) + 0.1 + 0.5 * t
data = mogptk.Data(t, y)

# combine a custom kernel with built-ins via operators, add a linear mean
kernel = BrownianKernel() + gpr.WhiteKernel()
mean = gpr.LinearMean(input_dims=1)
model = mogptk.Model(data, kernel, inference=mogptk.Exact(), mean=mean)
model.train(method="Adam", lr=0.05, iters=150)
print("loss:", model.losses[-1], " slope:", mean.slope.numpy())
