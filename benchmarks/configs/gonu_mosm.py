"""BASELINE.md config #3: gold / oil / NASDAQ / USD-index multi-channel exact
GP with MOSM, missing-data imputation (mirrors the reference case study
examples/example_gold_oil_NASDAQ_USD.ipynb). Data read from the reference's
example datasets (read-only)."""
import sys, os, time
import numpy as np
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk

DATA = "/root/reference/examples/data/gonu"


def load():
    channels = [("Gold", "lmba-gold-usd-am-daily.csv", "Price"),
                ("Oil", "brent-daily.csv", "Price"),
                ("NASDAQ", "nasdaq.csv", "Close"),
                ("USD", "TWEXB.csv", "Price")]
    ds = mogptk.DataSet()
    for name, fname, ycol in channels:
        d = mogptk.LoadCSV(os.path.join(DATA, fname), x_col="Date", y_col=ycol, name=name)
        d.filter("2015-01-01", "2018-01-01")
        d.transform(mogptk.TransformDetrend(degree=1))
        d.transform(mogptk.TransformStandard())
        d.aggregate("week")
        ds.append(d)
    return ds


def main():
    ds = load()
    # simulate sensor failure on two channels
    ds["Gold"].remove_relative_range(0.4, 0.5)
    ds["Oil"].remove_relative_range(0.7, 0.8)

    model = mogptk.MOSM(ds, Q=3)
    model.init_parameters("LS")
    t0 = time.time()
    model.train(method="Adam", lr=0.02, iters=400, verbose=True)
    print("trained in %.1fs" % (time.time() - t0))
    print("imputation MAE:", model.error("MAE"))
    fig, _ = model.plot_prediction()
    fig.savefig("/tmp/gonu_mosm.png", dpi=70)
    print("saved /tmp/gonu_mosm.png")


if __name__ == "__main__":
    main()
