"""Formula-level validation of the exact-GP engine and MFK kriging against
straightforward numpy implementations (gpytorch/openmdao are unavailable, so
the closed-form math is the oracle)."""

import numpy as np
import pytest
import jax.numpy as jnp

from openmeasure_tpu.gp import kernels as K
from openmeasure_tpu.gp import exact_gp as E


RNG = np.random.default_rng(3)


def np_matern25(X1, X2, ls):
    d = np.linalg.norm((X1[:, None, :] - X2[None, :, :]) / ls, axis=-1)
    c = np.sqrt(5.0) * d
    return (1 + c + 5.0 / 3.0 * d ** 2) * np.exp(-c)


def np_rbf(X1, X2, ls):
    d2 = np.sum(((X1[:, None, :] - X2[None, :, :]) / ls) ** 2, axis=-1)
    return np.exp(-0.5 * d2)


class TestKernels:
    def test_matern25_matches_closed_form(self):
        X = RNG.standard_normal((15, 3))
        spec = K.MaternKernel(2.5)
        params = spec.init_params(3)
        ls = float(spec.lengthscale(params)[0])
        got = np.asarray(spec(params, jnp.asarray(X), jnp.asarray(X)))
        np.testing.assert_allclose(got, np_matern25(X, X, ls), rtol=1e-10)

    def test_matern_other_nus(self):
        X = RNG.standard_normal((10, 2))
        for nu in (0.5, 1.5):
            spec = K.MaternKernel(nu)
            got = np.asarray(spec(spec.init_params(2), jnp.asarray(X),
                                  jnp.asarray(X)))
            np.testing.assert_allclose(np.diagonal(got), 1.0, rtol=1e-12)
            assert np.all(got <= 1.0 + 1e-12)
        with pytest.raises(ValueError):
            K.MaternKernel(2.0)

    def test_rbf_matches_closed_form(self):
        X = RNG.standard_normal((12, 2))
        spec = K.RBFKernel()
        params = spec.init_params(2)
        ls = float(spec.lengthscale(params)[0])
        got = np.asarray(spec(params, jnp.asarray(X), jnp.asarray(X)))
        np.testing.assert_allclose(got, np_rbf(X, X, ls), rtol=1e-10)

    def test_ard_lengthscales(self):
        X = RNG.standard_normal((8, 3))
        spec = K.RBFKernel(ard_num_dims=3)
        params = spec.init_params(3)
        params["raw_lengthscale"] = jnp.asarray([0.0, 1.0, 2.0])
        ls = np.asarray(spec.lengthscale(params))
        got = np.asarray(spec(params, jnp.asarray(X), jnp.asarray(X)))
        np.testing.assert_allclose(got, np_rbf(X, X, ls), rtol=1e-10)

    def test_scale_kernel(self):
        X = RNG.standard_normal((6, 2))
        spec = K.ScaleKernel(K.RBFKernel())
        params = spec.init_params(2)
        base = K.RBFKernel()(params["base"], jnp.asarray(X), jnp.asarray(X))
        got = spec(params, jnp.asarray(X), jnp.asarray(X))
        outputscale = float(K.softplus(params["raw_outputscale"]))
        np.testing.assert_allclose(np.asarray(got),
                                   outputscale * np.asarray(base), rtol=1e-10)

    def test_linear_mean(self):
        X = RNG.standard_normal((5, 3))
        spec = K.LinearMean()
        params = spec.init_params(3)
        params["weights"] = jnp.asarray([1.0, 2.0, -1.0])
        params["bias"] = jnp.asarray(0.5)
        got = np.asarray(spec(params, jnp.asarray(X)))
        np.testing.assert_allclose(got, X @ [1, 2, -1] + 0.5, rtol=1e-12)


class TestMLLAndPosterior:
    def _setup(self):
        X = RNG.standard_normal((20, 2))
        y = np.sin(X[:, 0]) + 0.1 * RNG.standard_normal(20)
        mean = K.ConstantMean()
        kern = K.MaternKernel(2.5)
        lik = K.GaussianLikelihood()
        params = {"mean": mean.init_params(2),
                  "kernel": kern.init_params(2),
                  "likelihood": lik.init_params()}
        return X, y, mean, kern, lik, params

    def test_log_prob_matches_mvn_logpdf(self):
        X, y, mean, kern, lik, params = self._setup()
        noise = float(lik.noise(params["likelihood"]))
        lp = float(E.gp_log_prob(mean, kern, params, noise, jnp.asarray(X),
                                 jnp.asarray(y)))
        ls = float(kern.lengthscale(params["kernel"])[0])
        Kmat = np_matern25(X, X, ls) + noise * np.eye(20) + 1e-8 * np.eye(20)
        sign, logdet = np.linalg.slogdet(Kmat)
        resid = y - 0.0
        expect = (-0.5 * resid @ np.linalg.solve(Kmat, resid)
                  - 0.5 * logdet - 10 * np.log(2 * np.pi))
        np.testing.assert_allclose(lp, expect, rtol=1e-9)

    def test_posterior_matches_closed_form(self):
        X, y, mean, kern, lik, params = self._setup()
        noise = float(lik.noise(params["likelihood"]))
        Xs = RNG.standard_normal((7, 2))
        m_got, v_got = E.gp_posterior(mean, kern, params, noise,
                                      jnp.asarray(X), jnp.asarray(y),
                                      jnp.asarray(Xs), include_noise=True)
        ls = float(kern.lengthscale(params["kernel"])[0])
        Kmat = np_matern25(X, X, ls) + (noise + 1e-8) * np.eye(20)
        Ks = np_matern25(Xs, X, ls)
        Kinv_y = np.linalg.solve(Kmat, y)
        m_ref = Ks @ Kinv_y
        v_ref = (1.0 - np.sum(Ks * np.linalg.solve(Kmat, Ks.T).T, axis=1)
                 + noise)
        np.testing.assert_allclose(np.asarray(m_got), m_ref, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(v_got), v_ref, rtol=1e-6)

    def test_posterior_interpolates_with_tiny_noise(self):
        X, y, mean, kern, lik, params = self._setup()
        m_got, v_got = E.gp_posterior(mean, kern, params, 1e-9,
                                      jnp.asarray(X), jnp.asarray(y),
                                      jnp.asarray(X), include_noise=False)
        np.testing.assert_allclose(np.asarray(m_got), y, atol=1e-5)
        assert np.all(np.asarray(v_got) < 1e-5)

    def test_multitask_likelihood_noise_structure(self):
        lik = K.MultitaskGaussianLikelihood(num_tasks=3)
        p = lik.init_params()
        noises = np.asarray(lik.noise(p))
        assert noises.shape == (3,)
        # global softplus(0)+1e-4 + per-task softplus(0)
        np.testing.assert_allclose(
            noises, np.log(2) + 1e-4 + np.log(2), rtol=1e-6)


class TestKrigingFormulas:
    def test_level0_gls_beta_and_sigma2(self):
        from openmeasure_tpu.multifi.mfk import (_level_fit_terms, _regr,
                                                 _corr)
        X = jnp.asarray(RNG.standard_normal((15, 2)))
        y = jnp.asarray(RNG.standard_normal(15))
        theta = jnp.asarray([2.0, 0.5])
        F = _regr("linear", X)
        beta, gamma, sigma2, L, G = _level_fit_terms(theta, X, F, y)

        Xn, yn, Fn = map(np.asarray, (X, y, F))
        R = np.asarray(_corr(theta, X, X)) + 1e-10 * np.eye(15)
        Ri = np.linalg.inv(R)
        beta_ref = np.linalg.solve(Fn.T @ Ri @ Fn, Fn.T @ Ri @ yn)
        np.testing.assert_allclose(np.asarray(beta), beta_ref, rtol=1e-7)
        resid = yn - Fn @ beta_ref
        np.testing.assert_allclose(float(sigma2),
                                   resid @ Ri @ resid / 15, rtol=1e-7)


@pytest.mark.slow
class TestClosedFormGradOracle:
    """The closed-form (loss, grad) oracle that replaces autodiff in the
    training hot path must match ``jax.value_and_grad`` of the autodiff loss
    exactly, over the full supported spec family, and must leave the
    trainer's trajectories unchanged."""

    def _combos(self, d):
        for mean in [K.ZeroMean(), K.ConstantMean(), K.LinearMean()]:
            for kern in [K.RBFKernel(), K.MaternKernel(0.5),
                         K.MaternKernel(1.5), K.MaternKernel(2.5),
                         K.MaternKernel(2.5, ard_num_dims=d),
                         K.ScaleKernel(K.MaternKernel(2.5)),
                         K.ScaleKernel(K.RBFKernel())]:
                for likname in ("gauss", "fixed"):
                    yield mean, kern, likname

    def test_matches_autodiff_over_spec_family(self):
        import jax
        rng = np.random.default_rng(0)
        p, d, r = 17, 3, 4
        X = jnp.asarray(rng.standard_normal((p, d)))
        Y = jnp.asarray(rng.standard_normal((r, p)))
        n_checked = 0
        for mean, kern, likname in self._combos(d):
            if likname == "gauss":
                lik = K.GaussianLikelihood()
                likp = {"raw_noise": jnp.asarray(0.3)}
            else:
                lik = K.FixedNoiseGaussianLikelihood()
                likp = {"fixed_noise":
                        jnp.asarray(rng.uniform(0.01, 0.1, (p,)))}
            task = {"mean": mean.init_params(d),
                    "kernel": kern.init_params(d), "likelihood": likp}
            task = jax.tree_util.tree_map(
                lambda x: x + jnp.asarray(rng.standard_normal(x.shape)) * 0.3,
                task)
            if likname == "fixed":
                task["likelihood"]["fixed_noise"] = likp["fixed_noise"]
            params = jax.tree_util.tree_map(
                lambda x: jnp.stack([x + 0.05 * i for i in range(r)]), task)
            if likname == "fixed":
                params["likelihood"]["fixed_noise"] = jnp.stack(
                    [likp["fixed_noise"]] * r)

            loss_fn = E.make_single_task_loss(mean, kern, lik, X, Y)
            vag = E.make_single_task_value_and_grad(mean, kern, lik, X, Y)
            assert vag is not None

            def total(pr, loss_fn=loss_fn):
                return jnp.sum(loss_fn(pr)), loss_fn(pr)
            (_, losses_ad), grads_ad = jax.value_and_grad(
                total, has_aux=True)(params)
            losses_cf, grads_cf = vag(params)
            np.testing.assert_allclose(np.asarray(losses_cf),
                                       np.asarray(losses_ad),
                                       rtol=1e-12, atol=1e-12)
            for ga, gc in zip(jax.tree_util.tree_leaves(grads_ad),
                              jax.tree_util.tree_leaves(grads_cf)):
                np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                           rtol=1e-9, atol=1e-11)
            n_checked += 1
        assert n_checked == 42

    def test_unsupported_specs_return_none(self):
        X = jnp.zeros((5, 2))
        Y = jnp.zeros((3, 5))
        assert E.make_single_task_value_and_grad(
            K.ConstantMean(), K.LinearKernel(), K.GaussianLikelihood(),
            X, Y) is None
        assert E.make_single_task_value_and_grad(
            K.ConstantMean(), K.MaternKernel(2.5),
            K.MultitaskGaussianLikelihood(3), X, Y) is None

    def test_trainer_trajectory_identical_to_autodiff(self):
        import jax
        rng = np.random.default_rng(7)
        p, d, r = 12, 2, 3
        X = jnp.asarray(rng.standard_normal((p, d)))
        Y = jnp.asarray(rng.standard_normal((r, p)))
        mean, kern, lik = K.ConstantMean(), K.MaternKernel(2.5), \
            K.GaussianLikelihood()
        task0 = {"mean": mean.init_params(d), "kernel": kern.init_params(d),
                 "likelihood": lik.init_params()}
        params0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (r,) + x.shape), task0)
        loss_fn = E.make_single_task_loss(mean, kern, lik, X, Y)
        vag = E.make_single_task_value_and_grad(mean, kern, lik, X, Y)
        res_ad = E.adam_early_stop(loss_fn, params0, lr=0.1, max_iter=60,
                                   rel_error=1e-6)
        res_cf = E.adam_early_stop(loss_fn, params0, lr=0.1, max_iter=60,
                                   rel_error=1e-6, value_and_grad=vag)
        np.testing.assert_array_equal(np.asarray(res_cf.iterations),
                                      np.asarray(res_ad.iterations))
        np.testing.assert_allclose(np.asarray(res_cf.loss),
                                   np.asarray(res_ad.loss),
                                   rtol=1e-10, atol=1e-12)
        for a, c in zip(jax.tree_util.tree_leaves(res_ad.params),
                        jax.tree_util.tree_leaves(res_cf.params)):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-8, atol=1e-10)

    def test_multitask_oracle_matches_autodiff(self):
        import jax
        rng = np.random.default_rng(11)
        p, d, r = 13, 2, 3
        X = jnp.asarray(rng.standard_normal((p, d)))
        Y = jnp.asarray(rng.standard_normal((p, r)))
        mean, kern = K.ConstantMean(), K.MaternKernel(2.5)
        lik = K.MultitaskGaussianLikelihood(num_tasks=r)
        task = {"mean": mean.init_params(d), "kernel": kern.init_params(d)}
        params = {
            "tasks": jax.tree_util.tree_map(
                lambda x: jnp.stack([x + 0.1 * i for i in range(r)]), task),
            "likelihood": jax.tree_util.tree_map(
                lambda x: x + 0.2, lik.init_params()),
        }
        loss_raw = E.make_multitask_loss(mean, kern, lik, X, Y)
        vag = E.make_multitask_value_and_grad(mean, kern, lik, X, Y)
        assert vag is not None
        # PIGPR path (added loss) must fall back to autodiff
        assert E.make_multitask_value_and_grad(
            mean, kern, lik, X, Y, added_loss_fn=lambda p_: 0.0) is None

        def total(pr):
            return jnp.sum(loss_raw(pr)), loss_raw(pr)
        (_, l_ad), g_ad = jax.value_and_grad(total, has_aux=True)(params)
        l_cf, g_cf = vag(params)
        np.testing.assert_allclose(np.asarray(l_cf), np.asarray(l_ad),
                                   rtol=1e-12, atol=1e-12)
        for a, c in zip(jax.tree_util.tree_leaves(g_ad),
                        jax.tree_util.tree_leaves(g_cf)):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-9, atol=1e-11)
