"""Data loading: arrays, functions, CSVs, DataFrames, datetime axes
(mirrors examples/01_Data_Loading.ipynb)."""
import numpy as np
import pandas as pd
import mogptk_tpu as mogptk

# from arrays
data = mogptk.Data([0, 1, 2, 3], [4.0, 3.0, 5.0, 6.0], name="arrays")
print(data)

# from a function
data = mogptk.LoadFunction(lambda x: np.sin(3 * x), 0, 10, n=200, var=0.1, name="sine")
print("function data:", len(data.Y), "points")

# from a DataFrame with a datetime axis
df = pd.DataFrame({
    "date": pd.date_range("2020-01-01", periods=50, freq="D"),
    "price": np.cumsum(np.random.randn(50)) + 100,
})
data = mogptk.LoadDataFrame(df, x_col="date", y_col="price", name="prices")
print("datetime dtype:", data.X_dtypes[0])

# multi-channel DataSet
t = np.linspace(0, 5, 40)
ds = mogptk.DataSet(t, [np.sin(t), np.cos(t)], names=["sin", "cos"])
print("channels:", ds.get_names())
