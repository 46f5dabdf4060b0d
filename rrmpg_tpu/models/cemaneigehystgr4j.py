"""Cemaneige-Hysteresis + GR4J coupled model interface class.

API-compatible with the reference ``CemaneigeHystGR4J``
(``rrmpg/models/cemaneigehystgr4j.py``): eight parameters (CTG, Kf, Thacc,
Rsp, x1..x4 with widened GR4J bounds), ``fit(loss_metric='mse'|'kge')`` and
the multi-objective ``fit_Q_SCA`` calibration against discharge plus five
NDSI snow-cover bands (weights 0.75 / 5 x 0.05,
``cemaneigehystgr4j.py:663-689``).

Documented divergence: the reference's single-objective KGE loss minimizes
``calc_kge`` directly (``cemaneigehystgr4j.py:608-609``) -- i.e. it
*minimizes* the efficiency, a sign bug -- while its own ``fit_Q_SCA``
correctly minimizes ``1 - kge``.  Here both paths minimize ``1 - kge``.
"""

import jax.numpy as jnp
import numpy as np

import functools

from ..ops.compositions import run_cemaneigehystgr4j
from ..ops.uh import required_uh_lengths
from ..utils.array_checks import validate_array_input
from ._snow_base import CemaneigeBase
from .gr4j import GR4J


def _loss_fn(loss_metric):
    # Shared minimization-oriented loss ('mse'/'rmse'/'nse'/'kge'); the
    # fused Q+SCA statistics path additionally restricts itself to
    # mse/kge inside _pallas_q_sca_objective.
    from ..utils.metrics import calibration_loss

    return calibration_loss(loss_metric)


class CemaneigeHystGR4J(CemaneigeBase):
    """Interface to the Cemaneige-Hysteresis + GR4J coupled model."""

    _param_list = ['CTG', 'Kf', 'Thacc', 'Rsp', 'x1', 'x2', 'x3', 'x4']

    _default_bounds = {'CTG': (0, 1),
                       'Kf': (0, 10),
                       'Thacc': (0, 1000),
                       'Rsp': (0, 1),
                       'x1': (10, 1200),
                       'x2': (-5, 3),
                       'x3': (20, 5000),
                       'x4': (1.1, 10)}

    _dtype = np.dtype([('CTG', np.float64),
                       ('Kf', np.float64),
                       ('Thacc', np.float64),
                       ('Rsp', np.float64),
                       ('x1', np.float64),
                       ('x2', np.float64),
                       ('x3', np.float64),
                       ('x4', np.float64)])

    def __init__(self, params=None):
        super().__init__(params=params)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _kernel_for(num_uh1, num_uh2):
        def kernel(prec, mean_temp, etp, frac_solid_prec, snow_pack_init,
                   thermal_state_init, sca_init, s_init, r_init, params):
            return run_cemaneigehystgr4j(
                prec, mean_temp, etp, frac_solid_prec, snow_pack_init,
                thermal_state_init, sca_init, s_init, r_init, params,
                num_uh1, num_uh2)
        return kernel

    def _prepare(self, prec, mean_temp, min_temp, max_temp, etp,
                 met_station_height, altitudes, snow_pack_init,
                 thermal_state_init, sca_init, s_init, r_init,
                 extra_series=()):
        extra = (('pot. evapotranspiration', etp),) + tuple(extra_series)
        prec, mean_temp, frac_solid_prec, _, extras = self._validate_met(
            prec, mean_temp, min_temp, max_temp, met_station_height,
            altitudes, extra_series=extra)
        etp, extras = extras[0], extras[1:]
        snow_pack_init = self._validate_number(snow_pack_init,
                                               'snow_pack_init')
        thermal_state_init = self._validate_number(thermal_state_init,
                                                   'thermal_state_init')
        sca_init = self._validate_number(sca_init, 'sca_init')
        s_init, r_init = GR4J._validate_inits(s_init, r_init)
        return (prec, mean_temp, frac_solid_prec, etp, snow_pack_init,
                thermal_state_init, sca_init, s_init, r_init, extras)

    def simulate(self, prec, mean_temp, min_temp, max_temp, etp,
                 met_station_height, snow_pack_init=0, thermal_state_init=0,
                 sca_init=0, s_init=0, r_init=0, altitudes=[],
                 return_storage=False, params=None, mesh=None,
                 engine="xla", interpret=False, initial_state=None,
                 return_final_state=False):
        """Simulate the coupled hysteresis snow + runoff model.

        Args / semantics as :meth:`CemaneigeGR4J.simulate`, plus
        ``sca_init`` (initial snow-covered area fraction).
        ``initial_state`` / ``return_final_state`` carry a
        :class:`~rrmpg_tpu.models.states.SnowGR4JState` whose snow half is
        a :class:`~rrmpg_tpu.models.states.CemaneigeHystState` (adds the
        SCA hysteresis carry and the original series' annual solid
        precipitation).

        Returns:
            qsim (T, N); plus G, eTG, sca, rain (each (T, L, N)) and
            s_store, r_store (each (T, N)) if ``return_storage``,
            ordered (qsim, G, eTG, s_store, r_store, sca, rain) as in
            the reference (``cemaneigehystgr4j.py:287-290``); plus the
            final state if ``return_final_state``.
        """
        (prec, mean_temp, frac_solid_prec, etp, snow_pack_init,
         thermal_state_init, sca_init, s_init, r_init, _) = self._prepare(
            prec, mean_temp, min_temp, max_temp, etp, met_station_height,
            altitudes, snow_pack_init, thermal_state_init, sca_init,
            s_init, r_init)
        inits = (snow_pack_init, thermal_state_init, sca_init, s_init,
                 r_init)
        self._check_no_cold_inits(
            initial_state, inits,
            ('snow_pack_init', 'thermal_state_init', 'sca_init', 's_init',
             'r_init'))

        param_dict, _ = self._prepare_params(params)
        if initial_state is not None or return_final_state:
            self._check_stateful_engine(engine, mesh, return_storage)
            n1, n2 = required_uh_lengths(param_dict['x4'])
            return self._simulate_stateful(
                hyst=True, ice=False, num_uh1=n1, num_uh2=n2,
                param_dict=param_dict, initial_state=initial_state,
                return_final_state=return_final_state,
                return_storage=return_storage, prec=prec,
                mean_temp=mean_temp, etp=etp,
                frac_solid_prec=frac_solid_prec, inits=inits,
                mesh=mesh, engine=engine, interpret=interpret)
        if engine == "pallas":
            if mesh is not None:
                raise ValueError(
                    "engine='pallas' simulate runs single-device through "
                    "the class API and would silently ignore mesh; use "
                    "engine='xla' for sharded simulation, or the "
                    "regional/ensemble helpers in rrmpg_tpu.parallel.")
            if return_storage:
                raise ValueError(
                    "engine='pallas' computes discharge only; use "
                    "engine='xla' for storage trajectories.")
            return self._pallas_simulate(
                param_dict, prec, mean_temp, etp, frac_solid_prec,
                snow_pack_init, thermal_state_init, s_init, r_init,
                hyst=True, interpret=interpret)
        if engine != "xla":
            raise ValueError("engine must be 'xla' or 'pallas'.")
        n1, n2 = required_uh_lengths(param_dict['x4'])
        qsim, G, eTG, s_store, r_store, sca, rain = self._run_batched(
            self._kernel_for(n1, n2),
            (prec, mean_temp, etp, frac_solid_prec, snow_pack_init,
             thermal_state_init, sca_init, s_init, r_init),
            param_dict, mesh=mesh)
        if return_storage:
            return qsim, G, eTG, s_store, r_store, sca, rain
        return qsim

    def _warm_cycle_pieces(self, forcings, sim_kwargs):
        """Device-resident cycling pieces (see CemaneigeBase)."""
        return self._warm_cycle_pieces_snow(forcings, sim_kwargs,
                                            hyst=True, ice=False)

    def _fused_stats(self, qobs, param_dict, sim_kwargs):
        """Trajectory-free sufficient statistics for
        ``monte_carlo(return_qsim=False, engine='pallas')``
        (see :meth:`CemaneigeBase._fused_stats_family`)."""
        return self._fused_stats_family(qobs, param_dict,
                                        sim_kwargs, hyst=True,
                                        ice=False)

    def fit(self, obs, prec, mean_temp, min_temp, max_temp, etp,
            met_station_height, loss_metric="mse", snow_pack_init=0,
            thermal_state_init=0, sca_init=0, s_init=0, r_init=0,
            altitudes=[], seed=None, engine="xla", interpret=False,
            initial_state=None, **de_kwargs):
        """Calibrate on observed discharge (device DE).

        Args:
            loss_metric: 'mse' or 'kge' (minimizes 1 - KGE; see module
                docstring for the divergence from the reference).
            engine: 'xla', or 'pallas' to evaluate each DE generation with
                the fused coupled-model ensemble kernel (KGE runs from
                on-device sufficient statistics).
            initial_state: (optional) single-member
                :class:`~rrmpg_tpu.models.states.SnowGR4JState` (hyst
                snow half) -- calibrate a continuation segment from a
                known initial condition (``engine='xla'`` only).

        Returns:
            An :class:`~rrmpg_tpu.tools.calibration.OptimizeResult`.
        """
        from ..tools.calibration import minimize

        loss = _loss_fn(loss_metric)
        obs = validate_array_input(obs, np.float64, 'obs')
        (prec, mean_temp, frac_solid_prec, etp, snow_pack_init,
         thermal_state_init, sca_init, s_init, r_init, _) = self._prepare(
            prec, mean_temp, min_temp, max_temp, etp, met_station_height,
            altitudes, snow_pack_init, thermal_state_init, sca_init,
            s_init, r_init)
        self._check_no_cold_inits(
            initial_state,
            (snow_pack_init, thermal_state_init, sca_init, s_init, r_init),
            ('snow_pack_init', 'thermal_state_init', 'sca_init', 's_init',
             'r_init'))

        bounds = tuple(self._default_bounds[p] for p in self._param_list)

        if initial_state is not None:
            return self._warm_fit_de(
                hyst=True, ice=False, engine=engine,
                initial_state=initial_state, prec=prec,
                mean_temp=mean_temp, etp=etp,
                frac_solid_prec=frac_solid_prec, obs=obs, loss=loss,
                seed=seed, de_kwargs=de_kwargs,
                loss_metric=loss_metric, interpret=interpret)

        if engine == "pallas":
            batch_objective = self._pallas_batch_objective(
                loss_metric, prec, mean_temp, etp, frac_solid_prec, obs,
                snow_pack_init, thermal_state_init, s_init, r_init,
                hyst=True, interpret=interpret)
            return minimize(batch_objective, bounds,
                                          seed=seed, batched=True,
                                          **de_kwargs)
        if engine != "xla":
            raise ValueError("engine must be 'xla' or 'pallas'.")

        args = tuple(jnp.asarray(a) for a in
                     (prec, mean_temp, etp, frac_solid_prec))
        obs_j = jnp.asarray(obs)
        names = self._param_list

        def objective(x):
            params = {name: x[i] for i, name in enumerate(names)}
            qsim, *_ = run_cemaneigehystgr4j(
                *args, snow_pack_init, thermal_state_init, sca_init, s_init,
                r_init, params)
            return loss(obs_j, qsim)

        return minimize(objective, bounds, seed=seed,
                                      **de_kwargs)

    def fit_Q_SCA(self, obs, prec, mean_temp, min_temp, max_temp, etp,
                  NDSI1, NDSI2, NDSI3, NDSI4, NDSI5, met_station_height,
                  loss_metric="mse", snow_pack_init=0, thermal_state_init=0,
                  sca_init=0, s_init=0, r_init=0, altitudes=[], seed=None,
                  engine="xla", interpret=False, initial_state=None,
                  pareto=False, **de_kwargs):
        """Multi-objective calibration on discharge + snow-covered area.

        The loss is ``0.75 * L(obs, qsim) + 0.05 * sum_b L(NDSI_b,
        100 * sca_b)`` over the five elevation bands, with L selected by
        ``loss_metric`` ('mse', or 'kge' minimizing 1 - KGE), following
        the reference (``cemaneigehystgr4j.py:663-689``).
        ``initial_state`` calibrates a continuation segment from a known
        initial condition (``engine='xla'`` only).

        With ``pareto=True`` the fixed 75/5 blend is replaced by a true
        bi-objective optimization of ``(L_q, L_sca)`` with
        :func:`rrmpg_tpu.tools.moo.nsga2` (``**de_kwargs`` then holds
        nsga2 arguments, e.g. ``pop_size`` / ``n_generations``) and the
        whole Q-vs-SCA Pareto front is returned.

        Returns:
            An :class:`~rrmpg_tpu.tools.calibration.OptimizeResult`, or
            a :class:`~rrmpg_tpu.tools.moo.ParetoResult` when
            ``pareto=True``.
        """
        from ..tools.calibration import minimize

        loss = _loss_fn(loss_metric)
        obs = validate_array_input(obs, np.float64, 'obs')
        ndsi_series = tuple(
            ('NDSI{}'.format(i + 1), arr)
            for i, arr in enumerate((NDSI1, NDSI2, NDSI3, NDSI4, NDSI5)))
        (prec, mean_temp, frac_solid_prec, etp, snow_pack_init,
         thermal_state_init, sca_init, s_init, r_init, ndsi) = self._prepare(
            prec, mean_temp, min_temp, max_temp, etp, met_station_height,
            altitudes, snow_pack_init, thermal_state_init, sca_init,
            s_init, r_init, extra_series=ndsi_series)
        self._check_no_cold_inits(
            initial_state,
            (snow_pack_init, thermal_state_init, sca_init, s_init, r_init),
            ('snow_pack_init', 'thermal_state_init', 'sca_init', 's_init',
             'r_init'))

        bounds = tuple(self._default_bounds[p] for p in self._param_list)

        if pareto and initial_state is not None:
            raise ValueError(
                "fit_Q_SCA(pareto=True) supports cold starts only; run "
                "the scalarized fit for the warm path.")

        if initial_state is not None:
            return self._warm_fit_de(
                hyst=True, ice=False, engine=engine,
                initial_state=initial_state, prec=prec,
                mean_temp=mean_temp, etp=etp,
                frac_solid_prec=frac_solid_prec, obs=obs, loss=loss,
                seed=seed, de_kwargs=de_kwargs, ndsi=ndsi,
                loss_metric=loss_metric, interpret=interpret)

        if engine == "pallas":
            batch_objective = self._pallas_q_sca_objective(
                loss_metric, prec, mean_temp, etp, frac_solid_prec, obs,
                ndsi, snow_pack_init, thermal_state_init, s_init, r_init,
                interpret=interpret, components=pareto)
            if pareto:
                from ..tools.moo import nsga2
                return nsga2(batch_objective, bounds, seed=seed,
                             batched=True, **de_kwargs)
            return minimize(batch_objective, bounds,
                                          seed=seed, batched=True,
                                          **de_kwargs)
        if engine != "xla":
            raise ValueError("engine must be 'xla' or 'pallas'.")

        args = tuple(jnp.asarray(a) for a in
                     (prec, mean_temp, etp, frac_solid_prec))
        obs_j = jnp.asarray(obs)
        ndsi_j = jnp.stack([jnp.asarray(n) for n in ndsi])  # (5, T)
        names = self._param_list

        def q_sca_losses(x):
            params = {name: x[i] for i, name in enumerate(names)}
            qsim, _, _, _, _, sca, _ = run_cemaneigehystgr4j(
                *args, snow_pack_init, thermal_state_init, sca_init, s_init,
                r_init, params)
            loss_q = loss(obs_j, qsim)
            sca_bands = 100.0 * sca.T  # (L, T)
            loss_sca = sum(loss(ndsi_j[b], sca_bands[b]) for b in range(5))
            return loss_q, loss_sca

        if pareto:
            from ..tools.moo import nsga2

            def objectives(x):
                loss_q, loss_sca = q_sca_losses(x)
                return jnp.stack([loss_q, loss_sca])

            return nsga2(objectives, bounds, seed=seed, **de_kwargs)

        def objective(x):
            loss_q, loss_sca = q_sca_losses(x)
            return 0.75 * loss_q + 0.05 * loss_sca

        return minimize(objective, bounds, seed=seed,
                                      **de_kwargs)
