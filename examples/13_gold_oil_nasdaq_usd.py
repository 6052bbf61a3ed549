"""Case study — gold / oil / NASDAQ / USD index: four financial series as
one multi-output GP (mirrors the reference
examples/example_gold_oil_NASDAQ_USD.ipynb). The channels share
macroeconomic structure; MOSM's cross-spectral couplings let two
artificially-blinded channels be reconstructed from the other two."""
import os
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk

DATA = "/root/reference/examples/data/gonu"

# Load the four series from CSV, window to 2015-2018, remove the linear
# trend, standardize, and thin daily quotes to weekly aggregates.
channels = [("Gold", "lmba-gold-usd-am-daily.csv", "Price"),
            ("Oil", "brent-daily.csv", "Price"),
            ("NASDAQ", "nasdaq.csv", "Close"),
            ("USD", "TWEXB.csv", "Price")]
dataset = mogptk.DataSet()
for name, fname, ycol in channels:
    data = mogptk.LoadCSV(os.path.join(DATA, fname), x_col="Date",
                          y_col=ycol, name=name)
    data.filter("2015-01-01", "2018-01-01")
    data.transform(mogptk.TransformDetrend(degree=1))
    data.transform(mogptk.TransformStandard())
    data.aggregate("week")
    dataset.append(data)

# Simulate data loss on two channels in different windows.
dataset["Gold"].remove_relative_range(0.4, 0.5)
dataset["Oil"].remove_relative_range(0.7, 0.8)

# Q=3 spectral components; datetime axes again want rescale_x.
model = mogptk.MOSM(dataset, Q=3, rescale_x=True)
model.init_parameters("LS")
model.train(method="Adam", lr=0.02, iters=200, verbose=True)

# Imputation error over the blinded windows, plus the standard plots.
print("imputation MAE:", model.error("MAE"))
fig, _ = model.plot_prediction()
fig.savefig("/tmp/gonu_prediction.png", dpi=70)
print("saved /tmp/gonu_prediction.png")
