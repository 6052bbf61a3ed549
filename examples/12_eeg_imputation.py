"""Case study — EEG: three frontal electrodes as one multi-output GP
(mirrors the reference examples/example_eeg.ipynb). Neighbouring EEG
channels are strongly cross-correlated, so a gap in one electrode's trace
is recoverable from the other two through the MOSM cross-spectra."""
import pandas as pd
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk

# Load three frontal electrodes from the reference's example recording;
# LoadDataFrame builds one channel per y column.
df = pd.read_csv("/root/reference/examples/data/eeg.csv", index_col=0)
cols = ["EEG Fp1-Ref", "EEG Fp2-Ref", "EEG Fz-Ref"]
dataset = mogptk.LoadDataFrame(df.iloc[:240], x_col="time", y_col=cols)
for channel in dataset:
    channel.transform(mogptk.TransformStandard())

# Different dropout windows per electrode — each channel's gap is covered
# by the other two.
dataset[0].remove_relative_range(0.5, 0.6)
dataset[1].remove_relative_range(0.2, 0.3)

model = mogptk.MOSM(dataset, Q=2)
model.init_parameters("LS")
model.train(method="Adam", lr=0.02, iters=200, verbose=True)

# The error is computed on exactly the removed samples.
print("imputation MAE (volts):", model.error("MAE"))
fig, _ = model.plot_prediction()
fig.savefig("/tmp/eeg_prediction.png", dpi=70)
print("saved /tmp/eeg_prediction.png")
