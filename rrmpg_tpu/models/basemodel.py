"""Parent class for all models: parameter registry + batched execution engine.

API-compatible with the reference ``BaseModel``
(``rrmpg/models/basemodel.py:20-175``): structured-dtype parameter arrays,
uniform random sampling within default bounds, dict / ``np.void`` /
structured-ndarray ``set_params``.

What is new (TPU-first): the engine half.  Where every reference model loops
serially over parameter sets calling a numba kernel per set
(e.g. ``rrmpg/models/gr4j.py:169``), models here hand their pure JAX kernel
to :meth:`BaseModel._run_batched`, which jit-compiles ``vmap(kernel)`` over
the parameter axis once per (model, shapes) and evaluates the whole ensemble
as a single device program.  Very large ensembles can additionally shard the
parameter axis over a device mesh (see :mod:`rrmpg_tpu.parallel`).
"""

import numbers

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float


class BaseModel(object):
    """Base class for all rainfall-runoff models."""

    # List of strings containing all model parameters
    _param_list = []

    # Dict containing the default parameter bounds
    _default_bounds = {}

    # Structured numpy datatype (API parity with the reference; one float64
    # field per parameter).
    _dtype = np.dtype([])

    def __init__(self, params=None):
        """Initialize a hydrological model.

        Args:
            params: (optional) Dictionary with one key/value pair per model
                parameter.  If omitted, random parameters are drawn within
                the default bounds.

        Raises:
            AttributeError: If a model parameter is missing in the passed
                dictionary.
        """
        if params:
            missings = [p for p in self._param_list if p not in params.keys()]
            if len(missings) > 0:
                raise AttributeError("Missing the following model parameters: "
                                     "{}".format(missings))
        else:
            params = self.get_random_params()

        self.set_params(params)

    # ------------------------------------------------------------------
    # Parameter registry (reference semantics)
    # ------------------------------------------------------------------

    def get_random_params(self, num=1):
        """Sample ``num`` random parameter sets uniformly within bounds.

        Returns:
            A structured numpy array of the model's custom dtype.
        """
        params = np.zeros(num, dtype=self._dtype)
        for param in self._param_list:
            params[param] = np.random.uniform(
                low=self._default_bounds[param][0],
                high=self._default_bounds[param][1],
                size=num)
        return params

    def sample_params(self, key, num):
        """Device-side uniform parameter sampling (TPU path).

        Unlike :meth:`get_random_params` (host numpy RNG, structured array),
        this draws with ``jax.random`` directly into a dict of ``(num,)``
        device arrays -- suitable for sharded multi-million-member ensembles
        without host round-trips, and reproducible from an explicit PRNG key.
        """
        keys = jax.random.split(key, len(self._param_list))
        dtype = default_float()
        out = {}
        for k, param in zip(keys, self._param_list):
            low, high = self._default_bounds[param]
            out[param] = jax.random.uniform(
                k, (num,), dtype=dtype, minval=low, maxval=high)
        return out

    def get_params(self):
        """Return a dict with all model parameters and their current value."""
        return {param: getattr(self, param) for param in self._param_list}

    def set_params(self, params):
        """Set model parameters from a dict, ``np.void`` or structured array.

        Raises:
            ValueError: If any parameter is not a numerical value.
            AttributeError: If the dict contains an unknown parameter name.
            TypeError: If a numpy array doesn't match the model's custom
                dtype, or the input is neither dict nor numpy array.
        """
        if isinstance(params, dict):
            for param, value in params.items():
                if param in self._param_list:
                    if isinstance(value, numbers.Number):
                        setattr(self, param, value)
                    else:
                        msg = ["The value of parameter '{}'".format(param),
                               "must be numerical"]
                        raise ValueError("".join(msg))
                else:
                    msg = ["Unknow parameter '{}'.".format(param),
                           "Name must match one of the model parameters."
                           "Use {}".format(self.__class__.__name__),
                           ".get_parameter_names() to get a list of valid "
                           "names."]
                    raise AttributeError("".join(msg))

        elif isinstance(params, np.void):
            if params.dtype == self._dtype:
                for param in self._param_list:
                    setattr(self, param, params[param])
            else:
                msg = ["The parameter array has the wrong data type. ",
                       "It must be the custom data type of the model."]
                raise TypeError("".join(msg))

        elif isinstance(params, np.ndarray):
            if params.dtype == self._dtype:
                for param in self._param_list:
                    setattr(self, param, params[param][0])
            else:
                msg = ["The parameter array has the wrong data type. ",
                       "It must be the custom data type of the model."]
                raise TypeError("".join(msg))
        else:
            msg = ["Wrong input data type. Must be either a dict or a ",
                   "numpy.ndarray"]
            raise TypeError("".join(msg))

    def get_parameter_names(self):
        """Return the list of parameter names."""
        return self._param_list

    def get_default_bounds(self):
        """Return the dictionary containing the default parameter bounds."""
        return self._default_bounds

    def get_dtype(self):
        """Return the custom model datatype."""
        return self._dtype

    # ------------------------------------------------------------------
    # Batched execution engine (TPU-first replacement of the serial loop)
    # ------------------------------------------------------------------

    def _prepare_params(self, params):
        """Normalize a ``params`` argument to a dict of (N,) arrays.

        Accepts None (use the instance's attributes), ``np.void`` (single
        record), structured ndarray of the model dtype, or a dict of
        scalars/arrays.

        Returns:
            (param_dict, num_sets)
        """
        dtype = default_float()
        if params is None:
            pd = {p: jnp.asarray([getattr(self, p)], dtype=dtype)
                  for p in self._param_list}
            return pd, 1

        if isinstance(params, dict):
            arrs = {p: np.atleast_1d(np.asarray(params[p]))
                    for p in self._param_list}
            num = max(a.shape[0] for a in arrs.values())
            pd = {p: jnp.asarray(np.broadcast_to(a, (num,)), dtype=dtype)
                  for p, a in arrs.items()}
            return pd, num

        if isinstance(params, np.void):
            params = np.expand_dims(params, params.ndim)

        if isinstance(params, np.ndarray):
            if params.dtype != self._dtype:
                msg = ["The model parameters must be a numpy array of the ",
                       "models own custom data type."]
                raise TypeError("".join(msg))
            pd = {p: jnp.asarray(params[p], dtype=dtype)
                  for p in self._param_list}
            return pd, params.size

        msg = ["The model parameters must be a numpy array of the ",
               "models own custom data type."]
        raise TypeError("".join(msg))

    @classmethod
    def _batched_kernel(cls, kernel, num_forcing_args):
        """jit(vmap(kernel)) over the params axis, cached per model class.

        The kernel signature must be ``kernel(*forcings_and_inits, params)``
        where only ``params`` (a dict of scalars) is mapped.
        """
        cache = cls.__dict__.get('_kernel_cache')
        if cache is None:
            cache = {}
            setattr(cls, '_kernel_cache', cache)
        cache_key = (kernel, num_forcing_args)
        fn = cache.get(cache_key)
        if fn is None:
            in_axes = (None,) * num_forcing_args + (0,)
            fn = jax.jit(jax.vmap(kernel, in_axes=in_axes))
            cache[cache_key] = fn
        return fn

    def _run_batched(self, kernel, forcing_args, params, mesh=None):
        """Evaluate ``kernel`` for every parameter set in one device program.

        Args:
            kernel: pure function ``kernel(*forcing_args, params_dict)``.
            forcing_args: tuple of unbatched (shared) inputs.
            params: dict of (N,) parameter arrays.
            mesh: optional ``jax.sharding.Mesh``; if given, the ensemble
                axis is sharded across its 'ensemble' axis (GSPMD).

        Returns:
            Tuple of outputs with the parameter axis moved *last*
            (reference output convention: ``(T, N)`` / ``(T, L, N)``,
            see e.g. ``rrmpg/models/cemaneige.py:219-245``).
        """
        dtype = default_float()
        forcing_args = tuple(
            jnp.asarray(a, dtype=dtype) if isinstance(a, np.ndarray)
            and np.issubdtype(a.dtype, np.floating) else a
            for a in forcing_args)
        if mesh is not None:
            from ..parallel.ensemble import ensemble_run
            outputs = ensemble_run(kernel, forcing_args, params, mesh)
        else:
            fn = self._batched_kernel(kernel, len(forcing_args))
            outputs = fn(*forcing_args, params)
        if not isinstance(outputs, tuple):
            outputs = (outputs,)
        return tuple(np.moveaxis(np.asarray(o), 0, -1) for o in outputs)
