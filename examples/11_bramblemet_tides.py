"""Case study — Bramblemet tides: multi-station depth imputation on real
sensor data with datetime axes (mirrors the reference
examples/example_bramblemet.ipynb). Three tide gauges around the Solent
report water depth every few minutes; one station goes down for half a day
and the other two reconstruct it through the shared tidal signal."""
import os
import numpy as np
import pandas as pd
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk

DATA = "/root/reference/examples/data/bramblemet"

# Load each station: parse the Date/Time columns to datetime64, keep the
# DEPTH sensor, thin to 30-minute aggregates and a two-day window, and
# standardize per channel. Data.aggregate and Data.filter understand
# datetime64 directly.
dataset = mogptk.DataSet()
for fname, name in [("bramblemet.csv.gz", "Bramble"),
                    ("cambermet.csv.gz", "Camber"),
                    ("sotonmet.csv.gz", "Soton")]:
    df = pd.read_csv(os.path.join(DATA, fname))
    dt = pd.to_datetime(df["Date"] + " " + df["Time"], format="%d/%m/%Y %H:%M")
    df = pd.DataFrame({"t": dt,
                       "DEPTH": pd.to_numeric(df["DEPTH"], errors="coerce")
                       }).dropna()
    data = mogptk.Data(df["t"].to_numpy(), df["DEPTH"].to_numpy(), name=name)
    data.aggregate("30m")
    data.filter(np.datetime64("2020-01-01"), np.datetime64("2020-01-03"))
    data.transform(mogptk.TransformStandard())
    dataset.append(data)

# Simulate the outage: drop the middle fifth of the Bramble channel. The
# removed points stay available as the imputation ground truth.
dataset["Bramble"].remove_relative_range(0.4, 0.6)

# Datetime axes become large absolute floats (minutes since the epoch,
# ~2.6e7) — far outside f32's comfortable range. rescale_x=True centers
# and scales the inputs so the default f32 pipeline trains cleanly.
model = mogptk.MOSM(dataset, Q=2, rescale_x=True)
model.init_parameters("LS")
model.train(method="Adam", lr=0.02, iters=200, verbose=True)

# Error on the held-out outage window, and the imputation plot.
print("outage imputation MAE (m):", model.error("MAE"))
fig, _ = model.plot_prediction()
fig.savefig("/tmp/bramblemet_prediction.png", dpi=70)
print("saved /tmp/bramblemet_prediction.png")
