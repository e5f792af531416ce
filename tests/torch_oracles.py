"""Compact torch implementations of the reference architectures, used as
numeric parity oracles (torchvision is unavailable in this environment).

These reproduce the reference's *math* and, critically, its state_dict key
layout (encoder.resnet.0.weight, decoder.layers.0.self_attn.fc_q.weight, …)
so that tests exercise deephumor_tpu.convert.torch_import against the real
checkpoint contract (/root/reference/deephumor/models/*.py). Test-only code.
"""

import math

import torch
from torch import nn

BLOCK_COUNTS = (3, 4, 6, 3)
STAGE_WIDTHS = (64, 128, 256, 512)


class Bottleneck(nn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def make_resnet50_trunk():
    """nn.Sequential with the same child indices as the reference's
    ``children()[:-2]`` wrap (encoders.py:37-38): 0=conv1, 1=bn1, 2=relu,
    3=maxpool, 4..7=layer1..4."""
    layers = []
    cin = 64
    for s, (blocks, width) in enumerate(zip(BLOCK_COUNTS, STAGE_WIDTHS)):
        stage = []
        stride = 1 if s == 0 else 2
        for b in range(blocks):
            stage.append(Bottleneck(cin, width, stride if b == 0 else 1))
            cin = width * 4
        layers.append(nn.Sequential(*stage))
    return nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2, 1),
        *layers,
    )


def randomize_bn_stats(module, gen):
    """Gives BN layers non-trivial running stats so eval-mode parity tests
    actually exercise them."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.5, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
            m.weight.data.uniform_(0.5, 1.5, generator=gen)
            m.bias.data.uniform_(-0.5, 0.5, generator=gen)


class OracleImageEncoder(nn.Module):
    """Reference ImageEncoder (encoders.py:7-70)."""

    def __init__(self, emb_dim, spatial_features=False):
        super().__init__()
        self.spatial_features = spatial_features
        self.resnet = make_resnet50_trunk()
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.linear = nn.Linear(2048, emb_dim)
        self.bn = nn.BatchNorm1d(emb_dim)
        self.dropout = nn.Dropout(0.0)

    def forward(self, images):
        features = self.resnet(images)
        bs, dim = features.shape[:2]
        x = self.avgpool(features).reshape(bs, -1)
        emb = self.dropout(self.bn(self.linear(x)))
        if self.spatial_features:
            x = features.reshape(bs, dim, -1).transpose(2, 1)
            spatial_emb = self.dropout(self.linear(x))
            return emb, spatial_emb
        return emb


class OracleLabelEncoder(nn.Module):
    def __init__(self, num_tokens, emb_dim):
        super().__init__()
        self.embedding = nn.Embedding(num_tokens, emb_dim)
        self.dropout = nn.Dropout(0.0)

    def forward(self, labels):
        return self.dropout(self.embedding(labels).mean(dim=1))


class OracleImageLabelEncoder(nn.Module):
    def __init__(self, num_tokens, emb_dim):
        super().__init__()
        self.image_encoder = OracleImageEncoder(emb_dim)
        self.label_encoder = OracleLabelEncoder(num_tokens, emb_dim)
        self.linear = nn.Linear(2 * emb_dim, emb_dim)
        self.dropout = nn.Dropout(0.0)

    def forward(self, images, labels):
        emb = torch.cat(
            [self.image_encoder(images), self.label_encoder(labels)], dim=1
        )
        return self.dropout(self.linear(emb))


class OracleLSTMDecoder(nn.Module):
    """Reference LSTMDecoder (rnn_models.py:8-46), forward only."""

    def __init__(self, num_tokens, emb_dim, hidden_size, num_layers,
                 embedding=None):
        super().__init__()
        self.embedding = embedding or nn.Embedding(num_tokens, emb_dim)
        self.lstm = nn.LSTM(emb_dim, hidden_size, num_layers, batch_first=True)
        self.classifier = nn.Linear(hidden_size, num_tokens)

    def forward(self, image_emb, captions):
        token_emb = self.embedding(captions)
        x = torch.cat((image_emb.unsqueeze(1), token_emb), dim=1)
        outputs, _ = self.lstm(x)
        return self.classifier(outputs)


class OracleMHA(nn.Module):
    """Reference MultiHeadAttentionLayer (transformers.py:43-129)."""

    def __init__(self, hid_dim, n_heads):
        super().__init__()
        self.hid_dim, self.n_heads = hid_dim, n_heads
        self.head_dim = hid_dim // n_heads
        self.fc_q = nn.Linear(hid_dim, hid_dim)
        self.fc_k = nn.Linear(hid_dim, hid_dim)
        self.fc_v = nn.Linear(hid_dim, hid_dim)
        self.fc_o = nn.Linear(hid_dim, hid_dim)
        self.scale = nn.Parameter(
            torch.sqrt(torch.tensor(self.head_dim, dtype=torch.float32)),
            requires_grad=False,
        )

    def forward(self, query, key, value, mask=None):
        bs, seq_len = query.shape[:2]
        q, k, v = self.fc_q(query), self.fc_k(key), self.fc_v(value)
        q = q.view(bs, seq_len, self.n_heads, self.head_dim).permute(0, 2, 1, 3)
        k = k.view(bs, seq_len, self.n_heads, self.head_dim).permute(0, 2, 3, 1)
        v = v.view(bs, seq_len, self.n_heads, self.head_dim).permute(0, 2, 1, 3)
        energy = (q @ k) / self.scale
        if mask is not None:
            mask = mask.unsqueeze(1).repeat(1, self.n_heads, 1, 1)
            energy = energy.masked_fill(mask, -1e8)
        attention = torch.softmax(energy, dim=-1)
        x = attention @ v
        x = x.permute(0, 2, 1, 3).contiguous().view(bs, -1, self.hid_dim)
        return self.fc_o(x)


class OraclePFF(nn.Module):
    def __init__(self, hid_dim, pf_dim):
        super().__init__()
        self.fc_1 = nn.Linear(hid_dim, pf_dim)
        self.fc_2 = nn.Linear(pf_dim, hid_dim)

    def forward(self, x):
        return self.fc_2(torch.relu(self.fc_1(x)))


def _pad_mask(query, key, pad_index=0):
    bs, q_len = query.shape[:2]
    k_len = key.shape[1]
    return (key == pad_index).unsqueeze(1).expand(bs, q_len, k_len)


def _autoregr_mask(seq):
    bs, seq_len = seq.shape[:2]
    return torch.triu(torch.ones([bs, seq_len, seq_len]), 1).bool()


class OracleDecoderLayer(nn.Module):
    def __init__(self, hid_dim, n_heads, pf_dim, cross):
        super().__init__()
        self.self_attn = OracleMHA(hid_dim, n_heads)
        self.self_attn_ln = nn.LayerNorm(hid_dim)
        if cross:
            self.enc_attn = OracleMHA(hid_dim, n_heads)
            self.enc_attn_ln = nn.LayerNorm(hid_dim)
        self.pf = OraclePFF(hid_dim, pf_dim)
        self.pf_ln = nn.LayerNorm(hid_dim)
        self.cross = cross

    def forward(self, x, enc_out=None, input_mask=None, enc_mask=None):
        x = self.self_attn_ln(x + self.self_attn(x, x, x, mask=input_mask))
        if self.cross:
            x = self.enc_attn_ln(
                x + self.enc_attn(x, enc_out, enc_out, mask=enc_mask)
            )
        return self.pf_ln(x + self.pf(x))


class OracleTransformerDecoder(nn.Module):
    """Reference TransformerDecoder forward (transformers.py:432-490),
    cross-attention variant with the pad-to-common-length behavior."""

    def __init__(self, num_tokens, hid_dim, n_layers, n_heads, pf_dim,
                 max_len, pad_index=0, cross=True):
        super().__init__()
        self.pad_index = pad_index
        self.cross = cross
        self.tok_embedding = nn.Embedding(num_tokens, hid_dim)
        self.pos_embedding = nn.Embedding(max_len, hid_dim)
        self.layers = nn.ModuleList(
            [OracleDecoderLayer(hid_dim, n_heads, pf_dim, cross)
             for _ in range(n_layers)]
        )
        self.scale = nn.Parameter(
            torch.sqrt(torch.tensor(hid_dim, dtype=torch.float32)),
            requires_grad=False,
        )
        self.classifier = nn.Linear(hid_dim, num_tokens)

    def forward(self, x, enc_out=None, start_emb=None):
        bs, dec_seq_len = x.shape[:2]
        dec_seq_len += 1
        if self.cross:
            enc_seq_len, hid_dim = enc_out.shape[1:3]
            seq_len = max(dec_seq_len, enc_seq_len)
            x = torch.cat(
                [x, self.pad_index
                 * torch.ones(bs, seq_len - dec_seq_len).long()], dim=1
            )
            enc_out = torch.cat(
                [enc_out, torch.zeros(bs, seq_len - enc_seq_len, hid_dim)],
                dim=1,
            )
        else:
            seq_len = dec_seq_len

        tok_emb = self.tok_embedding(x)
        tok_emb = torch.cat((start_emb.unsqueeze(1), tok_emb), 1)
        tok_emb = tok_emb / self.scale

        indices = torch.arange(seq_len).repeat(bs, 1)
        emb = tok_emb + self.pos_embedding(indices)

        x = torch.cat([torch.ones(bs, 1).long(), x], dim=1)
        input_mask = _pad_mask(x, x, self.pad_index) | _autoregr_mask(x)

        enc_mask = None
        if self.cross:
            enc_inp_mask = (enc_out != 0.0).all(dim=-1).long()
            enc_mask = _pad_mask(x, enc_inp_mask, self.pad_index)

        h = emb
        for layer in self.layers:
            h = layer(h, enc_out, input_mask=input_mask, enc_mask=enc_mask)
        return self.classifier(h)


class OracleCaptioningLSTM(nn.Module):
    """Reference CaptioningLSTM (caption_models.py:9-98) with its exact
    state_dict layout."""

    def __init__(self, num_tokens, emb_dim=16, hidden_size=24, num_layers=2):
        super().__init__()
        self.encoder = OracleImageEncoder(emb_dim)
        self.decoder = OracleLSTMDecoder(num_tokens, emb_dim, hidden_size,
                                         num_layers)
        self.hp = {
            "num_tokens": num_tokens, "emb_dim": emb_dim,
            "hidden_size": hidden_size, "num_layers": num_layers,
            "enc_dropout": 0.0, "dec_dropout": 0.0,
        }

    def greedy_decode(self, image, max_len, unk_index=1, eos_index=3):
        emb = self.encoder(image)
        tokens = torch.zeros(1, 0, dtype=torch.long)
        out = []
        for _ in range(max_len):
            logits = self.decoder(emb, tokens)[:, -1]
            logits[:, unk_index] = float("-inf")
            nxt = logits.argmax(-1)
            out.append(int(nxt))
            if int(nxt) == eos_index:
                break
            tokens = torch.cat([tokens, nxt[:, None]], dim=1)
        return out


class OracleCaptioningLSTMWithLabels(nn.Module):
    """Reference CaptioningLSTMWithLabels (caption_models.py:101-195):
    decoder embedding shared with the label encoder's."""

    def __init__(self, num_tokens, emb_dim=16, hidden_size=24, num_layers=2):
        super().__init__()
        self.encoder = OracleImageLabelEncoder(num_tokens, emb_dim)
        self.decoder = OracleLSTMDecoder(
            num_tokens, emb_dim, hidden_size, num_layers,
            embedding=self.encoder.label_encoder.embedding,
        )
        self.hp = {
            "num_tokens": num_tokens, "emb_dim": emb_dim,
            "hidden_size": hidden_size, "num_layers": num_layers,
            "enc_dropout": 0.0, "dec_dropout": 0.0,
        }

    def greedy_decode(self, image, labels, max_len, unk_index=1, eos_index=3):
        emb = self.encoder(image, labels)
        tokens = torch.zeros(1, 0, dtype=torch.long)
        out = []
        for _ in range(max_len):
            logits = self.decoder(emb, tokens)[:, -1]
            logits[:, unk_index] = float("-inf")
            nxt = logits.argmax(-1)
            out.append(int(nxt))
            if int(nxt) == eos_index:
                break
            tokens = torch.cat([tokens, nxt[:, None]], dim=1)
        return out


class OracleCaptioningTransformerBase(nn.Module):
    """Reference CaptioningTransformerBase (caption_models.py:198-327)."""

    cross = False

    def __init__(self, num_tokens, hid_dim=16, n_layers=2, n_heads=4,
                 pf_dim=24, max_len=20):
        super().__init__()
        self.encoder = OracleImageEncoder(hid_dim,
                                          spatial_features=self.cross)
        self.decoder = OracleTransformerDecoder(
            num_tokens, hid_dim, n_layers, n_heads, pf_dim, max_len,
            pad_index=0, cross=self.cross,
        )
        self.hp = {
            "num_tokens": num_tokens, "hid_dim": hid_dim,
            "n_layers": n_layers, "n_heads": n_heads, "pf_dim": pf_dim,
            "enc_dropout": 0.0, "dec_dropout": 0.0, "pad_index": 0,
            "max_len": max_len,
        }

    def greedy_decode(self, image, max_len, unk_index=1, eos_index=3):
        if self.cross:
            start_emb, enc_out = self.encoder(image)
        else:
            start_emb, enc_out = self.encoder(image), None
        tokens = torch.zeros(1, 0, dtype=torch.long)
        out = []
        for t in range(max_len):
            if self.cross:
                logits = self.decoder(tokens, enc_out, start_emb)[:, t]
            else:
                logits = self.decoder(tokens, start_emb=start_emb)[:, t]
            logits[:, unk_index] = float("-inf")
            nxt = logits.argmax(-1)
            out.append(int(nxt))
            if int(nxt) == eos_index:
                break
            tokens = torch.cat([tokens, nxt[:, None]], dim=1)
        return out


class OracleCaptioningTransformer(OracleCaptioningTransformerBase):
    """Reference CaptioningTransformer (caption_models.py:330-461)."""

    cross = True
