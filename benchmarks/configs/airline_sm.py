"""BASELINE.md config #1: airline passengers, single-output SM (Q=3), exact GP."""
import sys, os, time
import numpy as np
import mogptk_tpu as mogptk


def main():
    data = mogptk.LoadCSV("/root/reference/examples/data/Airline_passenger.csv",
                          x_col=0, y_col=1, sep=" ", header=None, name="Passengers")
    data.transform(mogptk.TransformDetrend(degree=1))
    data.transform(mogptk.TransformStandard())
    data.remove_relative_range(0.8, 1.0)

    model = mogptk.SM(data, Q=3)
    model.init_parameters("LS")
    t0 = time.time()
    model.train(method="LBFGS", iters=80, verbose=True)
    print("trained in %.1fs" % (time.time() - t0))
    print("forecast MAE:", model.error("MAE"))


if __name__ == "__main__":
    main()
