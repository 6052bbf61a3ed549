"""BASELINE.md config #2: Mauna Loa CO2 — SM Q=5 exact GP with polynomial
detrend and long-range extrapolation (mirrors the reference's
examples/example_mauna_loa.ipynb). The reference fetches the series from
OpenML at runtime; this environment has no network, so we synthesize a
series with the same structure (quadratic trend + annual cycle + noise,
monthly cadence, N≈700) — the modeling pipeline is identical.
"""
import sys, os, time
import numpy as np
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk


def synth_co2(n=700):
    rng = np.random.RandomState(7)
    x = 1958.0 + np.arange(n) / 12.0  # monthly, like the real series
    trend = 315.0 + 0.8 * (x - 1958.0) + 0.012 * (x - 1958.0) ** 2
    seasonal = 2.8 * np.sin(2 * np.pi * x) + 0.8 * np.sin(4 * np.pi * x + 0.3)
    return x, trend + seasonal + 0.25 * rng.randn(n)


def main():
    x, y = synth_co2()
    stop = int(0.85 * len(x))

    data = mogptk.Data(x, y, name="Mauna Loa (synthetic)")
    data.remove_range(start=x[stop])          # hold out the future
    data.transform(mogptk.TransformDetrend(3))

    model = mogptk.SM(mogptk.DataSet(data), Q=5)
    model.init_parameters("LS")
    t0 = time.time()
    model.train(method="Adam", lr=0.02, iters=400, verbose=True)
    print("trained in %.1fs (N=%d, SM Q=5 exact)" % (time.time() - t0, stop))
    print("extrapolation MAE (ppm):", model.error("MAE"))
    fig, _ = model.plot_prediction()
    fig.savefig("/tmp/mauna_loa.png", dpi=70)
    print("saved /tmp/mauna_loa.png")


if __name__ == "__main__":
    main()
