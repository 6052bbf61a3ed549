"""EEG case study: multi-channel MOSM on three frontal EEG electrodes with a
removed range per channel (mirrors the reference examples/example_eeg.ipynb).
Data read from the reference's example datasets (read-only)."""
import sys, os, time
import numpy as np
import pandas as pd
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk


def main():
    df = pd.read_csv("/root/reference/examples/data/eeg.csv", index_col=0)
    cols = ["EEG Fp1-Ref", "EEG Fp2-Ref", "EEG Fz-Ref"]
    ds = mogptk.LoadDataFrame(df.iloc[:240], x_col="time", y_col=cols)
    for channel in ds:
        channel.transform(mogptk.TransformStandard())
    ds[0].remove_relative_range(0.5, 0.6)
    ds[1].remove_relative_range(0.2, 0.3)

    model = mogptk.MOSM(ds, Q=2)
    model.init_parameters("LS")
    t0 = time.time()
    model.train(method="Adam", lr=0.02, iters=400, verbose=True)
    print("trained in %.1fs" % (time.time() - t0))
    print("imputation MAE (volts):", model.error("MAE"))
    fig, _ = model.plot_prediction()
    fig.savefig("/tmp/eeg_mosm.png", dpi=70)
    print("saved /tmp/eeg_mosm.png")


if __name__ == "__main__":
    main()
