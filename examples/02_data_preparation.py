"""Data preparation: transformations, filtering, aggregation, removal
(mirrors examples/02_Data_Preparation.ipynb)."""
import numpy as np
import mogptk_tpu as mogptk

x = np.linspace(0, 20, 400)
y = 0.5 * x + np.exp(0.08 * x) * (1 + 0.2 * np.sin(2 * np.pi * x))
data = mogptk.Data(x, y, name="trended")

# stack invertible transformations: log then detrend then standardize
data.transform(mogptk.TransformLog)
data.transform(mogptk.TransformDetrend(degree=1))
data.transform(mogptk.TransformStandard)

# filter the x range, aggregate into bins
data.filter(2.0, 18.0)
data.aggregate(0.5, f=np.mean)

# simulate sensor failure and subsampling
data.remove_random_ranges(2, 1.0)
data.remove_randomly(pct=0.1)
print("train points:", int(np.sum(data.mask)), "of", len(data.Y))

# roundtrip check
xt, yt = data.get_data(transformed=True)
back = data.Y_transformer.backward(yt, xt)
print("transform roundtrip max err:", float(np.abs(back - data.Y).max()))
