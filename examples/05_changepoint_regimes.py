"""Change-point regime switching: a ChangePointsKernel blends two kernels
through a trained sigmoid over a 1-D axis, letting one GP model a series
whose dynamics switch at an unknown location (the end-to-end analog of the
reference's examples/example_airquality_changepoint.ipynb; the full UCI
air-quality case study lives in benchmarks/configs/airquality_changepoint.py).
"""
import numpy as np
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk
import mogptk_tpu.gpr as gpr


def main():
    # synthetic two-regime series: slow sine, then fast sine after t=5
    rng = np.random.RandomState(3)
    t = np.linspace(0, 10, 160)
    y = np.where(t < 5.0, np.sin(1.0 * t), 0.6 * np.sin(6.0 * t))
    y = y + 0.05 * rng.randn(t.shape[0])

    data = mogptk.Data(t, y, name="two-regime")
    data.remove_relative_range(0.85, 1.0)  # hold out the tail
    data.transform(mogptk.TransformStandard())

    # one SE kernel per regime, blended at a trained location (init at t=4,
    # away from the true switch to show it moves)
    k1 = gpr.SquaredExponentialKernel()
    k2 = gpr.SquaredExponentialKernel()
    kernel = gpr.ChangePointsKernel([4.0], 3.0, k1, k2)

    model = mogptk.Model(data, kernel)
    model.train(method="Adam", lr=0.05, iters=300, verbose=True)
    model.print_parameters()

    loc = float(np.asarray(kernel.locations()).reshape(-1)[0])
    print("learned change point: t=%.2f (true switch at t=5.0, init 4.0)" % loc)
    assert 4.0 <= loc <= 6.5, "change point did not move toward the regime switch"

    # the two regimes should learn different lengthscales
    l1 = float(k1.lengthscale()[0])
    l2 = float(k2.lengthscale()[0])
    print("regime lengthscales: %.3f (slow) vs %.3f (fast)" % (l1, l2))
    assert l2 < l1, "second regime should be rougher (shorter lengthscale)"

    print("tail-extrapolation MAE:", model.error("MAE"))
    fig, _ = model.plot_prediction()
    fig.savefig("/tmp/changepoint_regimes.png", dpi=70)
    print("saved /tmp/changepoint_regimes.png")


if __name__ == "__main__":
    main()
