"""Parameter initialization: Nyquist, Lomb-Scargle, BNSE, SM pre-fit
(mirrors examples/03_Parameter_Initialization.ipynb)."""
import numpy as np
import mogptk_tpu as mogptk

t = np.linspace(0, 10, 150)
y = np.sin(2 * np.pi * 0.5 * t) + 0.5 * np.sin(2 * np.pi * 1.3 * t) + 0.1 * np.random.randn(len(t))
data = mogptk.Data(t, y, name="two-tone")

print("nyquist:", data.get_nyquist_estimation())
A, B, C = data.get_ls_estimation(Q=2)
print("LS peaks at:", B.ravel(), "(true: 0.5, 1.3)")
A, B, C = data.get_bnse_estimation(Q=2, n=500, iters=100)
print("BNSE peaks at:", B.ravel())

model = mogptk.SM(data, Q=2)
for method in ["IPS", "LS", "BNSE"]:
    model.init_parameters(method)
    print(method, "init loss:", round(model.loss(), 3))
