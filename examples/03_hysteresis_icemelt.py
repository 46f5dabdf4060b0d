"""Hysteresis + ice-melt tutorial (reference Tutorial_Hysteresis_IceMelt).

The reference's Alpine-catchment dataset is not redistributable, so this
walkthrough generates a synthetic glaciated catchment from known
parameters, then demonstrates the three model variants and both
calibration modes (discharge-only KGE, and the multi-objective Q + SCA
fit against five NDSI snow-cover bands).
"""

import numpy as np

from rrmpg_tpu.models import (
    CemaneigeGR4JIce,
    CemaneigeHystGR4J,
    CemaneigeHystGR4JIce,
)
from rrmpg_tpu.utils import calc_kge

ALTITUDES = [550, 620, 700, 785, 920]
STATION = 700
FRAC_ICE = np.array([0.02, 0.04, 0.25, 0.51, 0.71])
TRUE = {"Thacc": 18.6, "Rsp": 0.22, "CTG": 0.78, "Kf": 4.02, "x1": 546,
        "x2": 0.53, "x3": 276, "x4": 1.32, "DDF": 5}


def synthetic_forcing(T=731, seed=42):
    rng = np.random.default_rng(seed)
    day = np.arange(T)
    season = np.sin(2 * np.pi * (day - 120) / 365.25)
    mean_temp = 5 + 12 * season + rng.normal(0, 3, T)
    min_temp = mean_temp - rng.uniform(1, 6, T)
    max_temp = mean_temp + rng.uniform(1, 6, T)
    prec = np.clip(rng.gamma(0.5, 6.0, T) - 0.5, 0, None)
    etp = np.clip(1.5 + 1.5 * season + rng.normal(0, 0.3, T), 0, None)
    return prec, mean_temp, min_temp, max_temp, etp


def main():
    import jax
    engine = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    prec, mean_t, min_t, max_t, etp = synthetic_forcing()
    common = dict(met_station_height=STATION, altitudes=ALTITUDES,
                  s_init=0.5, r_init=0.4)

    truth = CemaneigeHystGR4JIce(params=TRUE)
    out = truth.simulate(prec, mean_t, min_t, max_t, etp, FRAC_ICE,
                         sca_init=0.2, return_storage=True, **common)
    qobs = out[0].flatten()
    # "Observed" NDSI bands (percent snow-covered area per layer).
    ndsi = [100 * out[5][:, b, 0] for b in range(5)]

    # --- KGE calibration of each variant ---
    # (The synthetic catchment is heavily glaciated, so unlike the
    # reference tutorial's Alpine basin the no-ice variant cannot fit.)
    for name, model, kwargs in [
            ("Hyst+Ice", CemaneigeHystGR4JIce(),
             dict(loss_metric="kge", engine=engine)),
            ("Hyst", CemaneigeHystGR4J(),
             dict(loss_metric="kge", engine=engine)),
            ("Ice", CemaneigeGR4JIce(), dict(engine=engine))]:
        args = [qobs, prec, mean_t, min_t, max_t, etp]
        if "Ice" in name:
            args.append(FRAC_ICE)
        res = model.fit(*args, seed=0, maxiter=150, tol=1e-3,
                        **dict(common, **kwargs))
        model.set_params({p: v for p, v in
                          zip(model.get_parameter_names(), res.x)})
        sim_args = [prec, mean_t, min_t, max_t, etp]
        if "Ice" in name:
            sim_args.append(FRAC_ICE)
        qsim = model.simulate(*sim_args, **common).flatten()
        print(f"{name:9s}: fit fun={res.fun:.4f} nfev={res.nfev:6d} "
              f"KGE={calc_kge(qobs, qsim):.4f}")

    # --- Multi-objective Q + SCA calibration (0.75 / 5 x 0.05 weights) ---
    model = CemaneigeHystGR4JIce()
    res = model.fit_Q_SCA(qobs, prec, mean_t, min_t, max_t, etp, FRAC_ICE,
                          *ndsi, met_station_height=STATION,
                          loss_metric="kge", altitudes=ALTITUDES,
                          s_init=0.5, r_init=0.4, sca_init=0.2, seed=0,
                          maxiter=100)
    print(f"fit_Q_SCA: fun={res.fun:.4f} nfev={res.nfev}")


if __name__ == "__main__":
    main()
