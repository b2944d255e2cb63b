

def test_cond_mom_update_optimizer():
    """update_optimizer changes the learning rate mid-training and
    rebuilds the step closure (reference: conditional.py:158)."""
    from sup3r_tpu.models import Sup3rCondMom

    gen = [{'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    model = Sup3rCondMom(gen, learning_rate=1e-4)
    model.init_weights((1, 6, 6, 4, 2))
    _ = model.train_step_fn
    model.update_optimizer(learning_rate=5e-5)
    assert model._optimizer_config['learning_rate'] == 5e-5
    assert model._train_step_fn is None  # closure rebuilt lazily
