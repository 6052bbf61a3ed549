"""Air-quality change-point case study: regime-switching kernel on the UCI
air-quality NOx series (mirrors the reference
examples/example_airquality_changepoint.ipynb — daily downsampling, a
ChangePoints(Linear·SE | Linear·SE) + LocallyPeriodic kernel, Student-t SVGP
with density-initialized inducing points). Data read from the reference's
example datasets (read-only)."""
import sys, os, time
import numpy as np
import pandas as pd
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk
import mogptk_tpu.gpr as gpr


def load_nox_daily():
    df = pd.read_csv("/root/reference/examples/data/AirQualityUCI.csv", sep=";",
                     skiprows=lambda i: i >= 9358)
    df["Date"] = pd.to_datetime(df["Date"], format="%d/%m/%Y")
    df["Time"] = pd.to_datetime(df["Time"], format="%H.%M.%S")
    df["timestamp"] = df.apply(
        lambda row: pd.Timestamp.combine(row["Date"], row["Time"].time()), axis=1)
    df = df.replace([-200, 200.0], np.nan)
    day = pd.Timedelta(days=1)
    df = df[["timestamp", "NOx(GT)"]].resample(
        day, on="timestamp", closed="left", label="right", origin="start").mean()
    df.reset_index(drop=False, inplace=True)
    df["timestamp"] = (df["timestamp"] - df["timestamp"].iloc[0]) / day
    return df


def build_model(df, iters_hint=None):
    data = mogptk.LoadDataFrame(df, x_col="timestamp", y_col="NOx(GT)")
    data.remove_randomly(pct=0.25)
    data.transform(mogptk.TransformStandard())

    cp_loc_guess = 160.0
    k1 = gpr.LinearKernel() * gpr.SquaredExponentialKernel()
    k2 = gpr.LinearKernel() * gpr.SquaredExponentialKernel()
    kernel = gpr.ChangePointsKernel([cp_loc_guess], 1.5, k1, k2)
    kernel = kernel + gpr.LocallyPeriodicKernel()

    lik = gpr.StudentTLikelihood(dof=10, scale=1.0)
    model = mogptk.Model(
        data, kernel, mean=gpr.ConstantMean(),
        inference=mogptk.Hensman(inducing_points=20,
                                 init_inducing_points="density",
                                 likelihood=lik))
    model.gpr.likelihood.scale.assign(1.0, train=False)
    cps = model.gpr.kernel[0]
    cps.locations.assign(cp_loc_guess, train=True)
    cps.steepness.assign(1.5, train=False)
    lp = model.gpr.kernel[1]
    lp.period.assign(0.5, train=True)
    lp.magnitude.assign(0.5, train=True)
    return model


def main(iters=2000):
    np.random.seed(1410)
    df = load_nox_daily()
    model = build_model(df)
    t0 = time.time()
    model.train(method="Adam", lr=5e-2, iters=iters, verbose=True)
    print("trained in %.1fs" % (time.time() - t0))
    model.print_parameters()
    loc = float(np.asarray(model.gpr.kernel[0].locations()).reshape(-1)[0])
    print("learned change-point location: day %.1f (init 160.0)" % loc)
    print("held-out MAE:", model.error("MAE"))
    fig, _ = model.plot_prediction(sigma=1)
    fig.savefig("/tmp/airquality_changepoint.png", dpi=70)
    print("saved /tmp/airquality_changepoint.png")
    return model


if __name__ == "__main__":
    main()
