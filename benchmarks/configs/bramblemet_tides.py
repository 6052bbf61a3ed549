"""Bramblemet case study: multi-station tide-depth imputation with datetime
axes (mirrors the reference examples/example_bramblemet.ipynb). Exercises the
datetime64 pipeline on real sensor data with genuine gaps."""
import sys, os, time
import numpy as np
import pandas as pd
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk

DATA = "/root/reference/examples/data/bramblemet"


def load_station(fname, name):
    df = pd.read_csv(os.path.join(DATA, fname))
    dt = pd.to_datetime(df["Date"] + " " + df["Time"], format="%d/%m/%Y %H:%M")
    df = pd.DataFrame({"t": dt, "DEPTH": pd.to_numeric(df["DEPTH"], errors="coerce")}).dropna()
    data = mogptk.Data(df["t"].to_numpy(), df["DEPTH"].to_numpy(), name=name)
    data.aggregate("30m")
    data.filter(np.datetime64("2020-01-01"), np.datetime64("2020-01-03"))
    data.transform(mogptk.TransformStandard())
    return data


def main():
    ds = mogptk.DataSet()
    for fname, name in [("bramblemet.csv.gz", "Bramble"),
                        ("cambermet.csv.gz", "Camber"),
                        ("sotonmet.csv.gz", "Soton")]:
        ds.append(load_station(fname, name))
    # simulate an outage at one station
    ds["Bramble"].remove_relative_range(0.4, 0.6)

    # datetime axes become large absolute floats (minutes since epoch ~2.6e7);
    # rescale_x centers them so the default f32 precision trains cleanly.
    model = mogptk.MOSM(ds, Q=2, rescale_x=True)
    model.init_parameters("LS")
    t0 = time.time()
    model.train(method="Adam", lr=0.02, iters=300, verbose=True)
    print("trained in %.1fs" % (time.time() - t0))
    print("outage imputation MAE (m):", model.error("MAE"))
    fig, _ = model.plot_prediction()
    fig.savefig("/tmp/bramblemet.png", dpi=70)
    print("saved /tmp/bramblemet.png")


if __name__ == "__main__":
    main()
