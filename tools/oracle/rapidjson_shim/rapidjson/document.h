// Minimal rapidjson-compatible shim, written from scratch for the oracle
// harness (the reference repo's rapidjson submodule is not vendored and this
// environment has no network). Implements just the DOM/parse/write API subset
// the reference sources use. Numbers parse via strtod/strtoll => correctly
// rounded doubles, matching real rapidjson's full-precision behavior.
#ifndef RAPIDJSON_SHIM_DOCUMENT_H
#define RAPIDJSON_SHIM_DOCUMENT_H

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cassert>
#include <cerrno>
#include <string>
#include <vector>
#include <utility>
#include <type_traits>
#include <cmath>

#ifndef RAPIDJSON_HAS_STDSTRING
#define RAPIDJSON_HAS_STDSTRING 1
#endif

namespace rapidjson {

typedef unsigned SizeType;

enum Type {
    kNullType = 0, kFalseType = 1, kTrueType = 2,
    kObjectType = 3, kArrayType = 4, kStringType = 5, kNumberType = 6
};

enum ParseErrorCode { kParseErrorNone = 0, kParseErrorGeneric = 1 };

inline const char *GetParseError_En(ParseErrorCode code) {
    return code == kParseErrorNone ? "No error." : "Parse error.";
}

// Allocator: the shim Value owns its own memory (std::string/vector), so the
// allocator is a tag type passed around for API compatibility.
template<typename T = int>
class MemoryPoolAllocator {
public:
    MemoryPoolAllocator() = default;
};

class Value;
struct Member;

struct StringRefType {
    const char *s;
    size_t length;
    StringRefType(const char *str) : s(str), length(std::strlen(str)) {}
    StringRefType(const char *str, size_t len) : s(str), length(len) {}
};

inline StringRefType StringRef(const char *str) { return StringRefType(str); }
inline StringRefType StringRef(const std::string &str) { return StringRefType(str.c_str(), str.size()); }

class Value {
public:
    typedef MemoryPoolAllocator<> AllocatorType;

    Value() : type_(kNullType) {}
    explicit Value(Type type) : type_(type) {}
    Value(const char *s, AllocatorType &) : type_(kStringType), str_(s) {}
    Value(const std::string &s, AllocatorType &) : type_(kStringType), str_(s) {}
    template<typename T, typename std::enable_if<std::is_same<T, bool>::value, int>::type = 0>
    Value(T b) : type_(b ? kTrueType : kFalseType) {}
    Value(int i) : type_(kNumberType) { setIntVal((int64_t)i); }
    Value(unsigned u) : type_(kNumberType) { setIntVal((int64_t)u); }
    Value(long long i) : type_(kNumberType) { setIntVal((int64_t)i); }
    Value(unsigned long long u) : type_(kNumberType) { setIntVal((int64_t)u); }
    Value(long i) : type_(kNumberType) { setIntVal((int64_t)i); }
    Value(unsigned long u) : type_(kNumberType) { setIntVal((int64_t)u); }
    Value(double d) : type_(kNumberType) { d_ = d; isInt_ = false; }

    Value(Value &&other) noexcept { moveFrom(other); }
    Value &operator=(Value &&other) noexcept { if (this != &other) { clear(); moveFrom(other); } return *this; }
    Value(const Value &) = delete;
    Value &operator=(const Value &) = delete;

    ~Value() { clear(); }

    Value &Move() { return *this; }

    // ---- type queries ----
    bool IsNull() const { return type_ == kNullType; }
    bool IsObject() const { return type_ == kObjectType; }
    bool IsArray() const { return type_ == kArrayType; }
    bool IsString() const { return type_ == kStringType; }
    bool IsBool() const { return type_ == kTrueType || type_ == kFalseType; }
    bool IsNumber() const { return type_ == kNumberType; }
    bool IsDouble() const { return type_ == kNumberType && !isInt_; }
    bool IsInt() const { return type_ == kNumberType && isInt_ && i_ >= INT32_MIN && i_ <= INT32_MAX; }
    bool IsUint() const { return type_ == kNumberType && isInt_ && i_ >= 0 && i_ <= (int64_t)UINT32_MAX; }
    bool IsInt64() const { return type_ == kNumberType && isInt_; }
    bool IsUint64() const { return type_ == kNumberType && isInt_ && i_ >= 0; }

    // ---- getters ----
    const char *GetString() const { assert(IsString()); return str_.c_str(); }
    SizeType GetStringLength() const { return (SizeType)str_.size(); }
    bool GetBool() const { assert(IsBool()); return type_ == kTrueType; }
    double GetDouble() const { assert(IsNumber()); return isInt_ ? (double)i_ : d_; }
    int GetInt() const { assert(IsNumber()); return isInt_ ? (int)i_ : (int)d_; }
    unsigned GetUint() const { assert(IsNumber()); return isInt_ ? (unsigned)i_ : (unsigned)d_; }
    int64_t GetInt64() const { assert(IsNumber()); return isInt_ ? i_ : (int64_t)d_; }
    uint64_t GetUint64() const { assert(IsNumber()); return isInt_ ? (uint64_t)i_ : (uint64_t)d_; }

    template<typename T> bool Is() const;
    template<typename T> T Get() const;

    // ---- setters ----
    Value &SetObject() { clear(); type_ = kObjectType; return *this; }
    Value &SetArray() { clear(); type_ = kArrayType; return *this; }
    Value &SetNull() { clear(); type_ = kNullType; return *this; }
    Value &SetBool(bool b) { clear(); type_ = b ? kTrueType : kFalseType; return *this; }
    Value &SetInt(int i) { clear(); type_ = kNumberType; setIntVal(i); return *this; }
    Value &SetDouble(double d) { clear(); type_ = kNumberType; d_ = d; isInt_ = false; return *this; }
    Value &SetString(const char *s, AllocatorType &) { clear(); type_ = kStringType; str_ = s; return *this; }
    Value &SetString(const std::string &s, AllocatorType &) { clear(); type_ = kStringType; str_ = s; return *this; }
    Value &SetString(StringRefType ref) { clear(); type_ = kStringType; str_.assign(ref.s, ref.length); return *this; }

    // ---- object ----
    struct MemberIterator {
        Member **p;
        Member &operator*() const { return **p; }
        Member *operator->() const { return *p; }
        MemberIterator &operator++() { ++p; return *this; }
        bool operator==(const MemberIterator &o) const { return p == o.p; }
        bool operator!=(const MemberIterator &o) const { return p != o.p; }
    };
    struct ConstMemberIterator {
        Member *const *p;
        const Member &operator*() const { return **p; }
        const Member *operator->() const { return *p; }
        ConstMemberIterator &operator++() { ++p; return *this; }
        bool operator==(const ConstMemberIterator &o) const { return p == o.p; }
        bool operator!=(const ConstMemberIterator &o) const { return p != o.p; }
    };

    inline MemberIterator MemberBegin();
    inline MemberIterator MemberEnd();
    inline ConstMemberIterator MemberBegin() const;
    inline ConstMemberIterator MemberEnd() const;
    inline MemberIterator FindMember(const char *name);
    inline ConstMemberIterator FindMember(const char *name) const;
    inline bool HasMember(const char *name) const;
    inline Value &operator[](const char *name);
    inline const Value &operator[](const char *name) const;

    inline Value &AddMember(Value &name, Value &value, AllocatorType &);
    Value &AddMember(Value &&name, Value &&value, AllocatorType &a) { return AddMember(name, value, a); }
    Value &AddMember(Value &&name, Value &value, AllocatorType &a) { return AddMember(name, value, a); }
    Value &AddMember(Value &name, Value &&value, AllocatorType &a) { return AddMember(name, value, a); }
    inline Value &AddMember(StringRefType name, Value &value, AllocatorType &a);
    Value &AddMember(StringRefType name, Value &&value, AllocatorType &a) { return AddMember(name, value, a); }
    template<typename T, typename std::enable_if<
        !std::is_same<typename std::decay<T>::type, Value>::value, int>::type = 0>
    Value &AddMember(StringRefType name, T value, AllocatorType &a) {
        Value v(value);
        return AddMember(name, v, a);
    }

    // ---- array ----
    struct ValueIterator {
        Value *const *p;
        Value &operator*() const { return **p; }
        Value *operator->() const { return *p; }
        ValueIterator &operator++() { ++p; return *this; }
        ValueIterator operator++(int) { ValueIterator t = *this; ++p; return t; }
        bool operator==(const ValueIterator &o) const { return p == o.p; }
        bool operator!=(const ValueIterator &o) const { return p != o.p; }
    };
    struct ConstValueIterator {
        const Value *const *p;
        const Value &operator*() const { return **p; }
        const Value *operator->() const { return *p; }
        ConstValueIterator &operator++() { ++p; return *this; }
        ConstValueIterator operator++(int) { ConstValueIterator t = *this; ++p; return t; }
        bool operator==(const ConstValueIterator &o) const { return p == o.p; }
        bool operator!=(const ConstValueIterator &o) const { return p != o.p; }
    };

    SizeType Size() const { assert(IsArray()); return (SizeType)elems_.size(); }
    bool Empty() const { assert(IsArray()); return elems_.empty(); }
    Value &operator[](SizeType i) { assert(IsArray()); return *elems_[i]; }
    const Value &operator[](SizeType i) const { assert(IsArray()); return *elems_[i]; }

    ValueIterator Begin() { return ValueIterator{elems_.data()}; }
    ValueIterator End() { return ValueIterator{elems_.data() + elems_.size()}; }
    ConstValueIterator Begin() const { return ConstValueIterator{elems_.data()}; }
    ConstValueIterator End() const { return ConstValueIterator{elems_.data() + elems_.size()}; }

    Value &PushBack(Value &value, AllocatorType &) {
        assert(IsArray());
        Value *v = new Value(std::move(value));
        elems_.push_back(v);
        return *this;
    }
    Value &PushBack(Value &&value, AllocatorType &a) { return PushBack(value, a); }
    template<typename T, typename std::enable_if<
        !std::is_same<typename std::decay<T>::type, Value>::value, int>::type = 0>
    Value &PushBack(T value, AllocatorType &a) { Value v(value); return PushBack(v, a); }

    Value &Reserve(SizeType n, AllocatorType &) { elems_.reserve(n); return *this; }

    // range helpers: GetArray()/GetObject() proxies
    struct ArrayProxy {
        Value *v;
        ValueIterator begin() const { return v->Begin(); }
        ValueIterator end() const { return v->End(); }
        SizeType Size() const { return v->Size(); }
        Value &operator[](SizeType i) const { return (*v)[i]; }
    };
    struct ConstArrayProxy {
        const Value *v;
        ConstValueIterator begin() const { return v->Begin(); }
        ConstValueIterator end() const { return v->End(); }
        SizeType Size() const { return v->Size(); }
        const Value &operator[](SizeType i) const { return (*v)[i]; }
    };
    ArrayProxy GetArray() { assert(IsArray()); return ArrayProxy{this}; }
    ConstArrayProxy GetArray() const { assert(IsArray()); return ConstArrayProxy{this}; }

    struct ObjectProxy {
        Value *v;
        MemberIterator begin() const { return v->MemberBegin(); }
        MemberIterator end() const { return v->MemberEnd(); }
    };
    struct ConstObjectProxy {
        const Value *v;
        ConstMemberIterator begin() const { return v->MemberBegin(); }
        ConstMemberIterator end() const { return v->MemberEnd(); }
    };
    ObjectProxy GetObject() { assert(IsObject()); return ObjectProxy{this}; }
    ConstObjectProxy GetObject() const { assert(IsObject()); return ConstObjectProxy{this}; }

    // ---- writer hook ----
    template<typename Writer>
    inline bool Accept(Writer &w) const;

protected:
    Type type_;
    bool isInt_ = false;
    int64_t i_ = 0;
    double d_ = 0;
    std::string str_;
    std::vector<Member *> members_;
    std::vector<Value *> elems_;

    void setIntVal(int64_t i) { i_ = i; d_ = (double)i; isInt_ = true; }

    inline void clear();

    void moveFrom(Value &other) {
        type_ = other.type_;
        isInt_ = other.isInt_;
        i_ = other.i_;
        d_ = other.d_;
        str_ = std::move(other.str_);
        members_ = std::move(other.members_);
        elems_ = std::move(other.elems_);
        other.members_.clear();
        other.elems_.clear();
        other.type_ = kNullType;
    }

    friend class Document;
    friend class JsonParser;
    friend struct Member;
};

struct Member {
    Value name;
    Value value;
};

inline void Value::clear() {
    for (auto m : members_) delete m;
    members_.clear();
    for (auto e : elems_) delete e;
    elems_.clear();
    str_.clear();
    type_ = kNullType;
    isInt_ = false; i_ = 0; d_ = 0;
}

inline Value::MemberIterator Value::MemberBegin() { return MemberIterator{members_.data()}; }
inline Value::MemberIterator Value::MemberEnd() { return MemberIterator{members_.data() + members_.size()}; }
inline Value::ConstMemberIterator Value::MemberBegin() const { return ConstMemberIterator{members_.data()}; }
inline Value::ConstMemberIterator Value::MemberEnd() const { return ConstMemberIterator{members_.data() + members_.size()}; }

inline Value::MemberIterator Value::FindMember(const char *name) {
    size_t i = 0;
    for (; i < members_.size(); i++) if (members_[i]->name.str_ == name) break;
    return MemberIterator{members_.data() + i};
}
inline Value::ConstMemberIterator Value::FindMember(const char *name) const {
    size_t i = 0;
    for (; i < members_.size(); i++) if (members_[i]->name.str_ == name) break;
    return ConstMemberIterator{members_.data() + i};
}
inline bool Value::HasMember(const char *name) const { return FindMember(name) != MemberEnd(); }

inline Value &Value::operator[](const char *name) {
    auto it = FindMember(name);
    assert(it != MemberEnd());
    return it->value;
}
inline const Value &Value::operator[](const char *name) const {
    auto it = FindMember(name);
    assert(it != MemberEnd());
    return it->value;
}

inline Value &Value::AddMember(Value &name, Value &value, AllocatorType &) {
    assert(IsObject());
    Member *e = new Member();
    e->name = std::move(name);
    e->value = std::move(value);
    members_.push_back(e);
    return *this;
}
inline Value &Value::AddMember(StringRefType name, Value &value, AllocatorType &a) {
    Value n;
    n.type_ = kStringType;
    n.str_.assign(name.s, name.length);
    return AddMember(n, value, a);
}

template<typename Writer>
inline bool Value::Accept(Writer &w) const {
    switch (type_) {
        case kNullType: return w.Null();
        case kFalseType: return w.Bool(false);
        case kTrueType: return w.Bool(true);
        case kStringType: return w.String(str_.c_str(), (SizeType)str_.size(), true);
        case kNumberType:
            if (isInt_) return w.Int64(i_);
            return w.Double(d_);
        case kObjectType: {
            if (!w.StartObject()) return false;
            for (const auto &m : members_) {
                if (!w.Key(m->name.str_.c_str(), (SizeType)m->name.str_.size(), true)) return false;
                if (!m->value.Accept(w)) return false;
            }
            return w.EndObject((SizeType)members_.size());
        }
        case kArrayType: {
            if (!w.StartArray()) return false;
            for (const auto &e : elems_) if (!e->Accept(w)) return false;
            return w.EndArray((SizeType)elems_.size());
        }
    }
    return false;
}

// Is<T>/Get<T> specializations
template<> inline bool Value::Is<bool>() const { return IsBool(); }
template<> inline bool Value::Is<int>() const { return IsInt(); }
template<> inline bool Value::Is<unsigned>() const { return IsUint(); }
template<> inline bool Value::Is<int64_t>() const { return IsInt64(); }
template<> inline bool Value::Is<uint64_t>() const { return IsUint64(); }
template<> inline bool Value::Is<double>() const { return IsNumber(); }
template<> inline bool Value::Is<const char *>() const { return IsString(); }
template<> inline bool Value::Is<std::string>() const { return IsString(); }

template<> inline bool Value::Get<bool>() const { return GetBool(); }
template<> inline int Value::Get<int>() const { return GetInt(); }
template<> inline unsigned Value::Get<unsigned>() const { return GetUint(); }
template<> inline int64_t Value::Get<int64_t>() const { return GetInt64(); }
template<> inline uint64_t Value::Get<uint64_t>() const { return GetUint64(); }
template<> inline double Value::Get<double>() const { return GetDouble(); }
template<> inline const char *Value::Get<const char *>() const { return GetString(); }
template<> inline std::string Value::Get<std::string>() const { return std::string(GetString()); }

// ---- recursive-descent parser over an in-memory buffer ----
class JsonParser {
public:
    JsonParser(const char *s, size_t n) : p_(s), end_(s + n) {}

    bool parse(Value &out) {
        skipWs();
        if (!parseValue(out)) return false;
        skipWs();
        return true;
    }

    size_t line() const { return line_; }

private:
    const char *p_, *end_;
    size_t line_ = 1;

    void skipWs() {
        while (p_ < end_ && (*p_ == ' ' || *p_ == '\t' || *p_ == '\n' || *p_ == '\r')) {
            if (*p_ == '\n') line_++;
            p_++;
        }
    }

    bool parseValue(Value &out) {
        if (p_ >= end_) return false;
        switch (*p_) {
            case '{': return parseObject(out);
            case '[': return parseArray(out);
            case '"': return parseString(out);
            case 't': if (end_ - p_ >= 4 && !strncmp(p_, "true", 4)) { p_ += 4; out.SetBool(true); return true; } return false;
            case 'f': if (end_ - p_ >= 5 && !strncmp(p_, "false", 5)) { p_ += 5; out.SetBool(false); return true; } return false;
            case 'n': if (end_ - p_ >= 4 && !strncmp(p_, "null", 4)) { p_ += 4; out.SetNull(); return true; } return false;
            default: return parseNumber(out);
        }
    }

    bool parseObject(Value &out) {
        p_++; // {
        out.SetObject();
        skipWs();
        if (p_ < end_ && *p_ == '}') { p_++; return true; }
        while (true) {
            skipWs();
            if (p_ >= end_ || *p_ != '"') return false;
            Value name;
            if (!parseString(name)) return false;
            skipWs();
            if (p_ >= end_ || *p_ != ':') return false;
            p_++;
            skipWs();
            Value val;
            if (!parseValue(val)) return false;
            MemoryPoolAllocator<> a;
            out.AddMember(name, val, a);
            skipWs();
            if (p_ >= end_) return false;
            if (*p_ == ',') { p_++; continue; }
            if (*p_ == '}') { p_++; return true; }
            return false;
        }
    }

    bool parseArray(Value &out) {
        p_++; // [
        out.SetArray();
        skipWs();
        if (p_ < end_ && *p_ == ']') { p_++; return true; }
        while (true) {
            skipWs();
            Value val;
            if (!parseValue(val)) return false;
            MemoryPoolAllocator<> a;
            out.PushBack(val, a);
            skipWs();
            if (p_ >= end_) return false;
            if (*p_ == ',') { p_++; continue; }
            if (*p_ == ']') { p_++; return true; }
            return false;
        }
    }

    bool parseString(Value &out) {
        p_++; // "
        std::string s;
        while (p_ < end_ && *p_ != '"') {
            if (*p_ == '\\') {
                p_++;
                if (p_ >= end_) return false;
                switch (*p_) {
                    case '"': s += '"'; break;
                    case '\\': s += '\\'; break;
                    case '/': s += '/'; break;
                    case 'b': s += '\b'; break;
                    case 'f': s += '\f'; break;
                    case 'n': s += '\n'; break;
                    case 'r': s += '\r'; break;
                    case 't': s += '\t'; break;
                    case 'u': {
                        if (end_ - p_ < 5) return false;
                        unsigned cp = (unsigned)strtoul(std::string(p_ + 1, p_ + 5).c_str(), nullptr, 16);
                        p_ += 4;
                        // UTF-8 encode (BMP only; surrogate pairs unsupported)
                        if (cp < 0x80) s += (char)cp;
                        else if (cp < 0x800) { s += (char)(0xC0 | (cp >> 6)); s += (char)(0x80 | (cp & 0x3F)); }
                        else { s += (char)(0xE0 | (cp >> 12)); s += (char)(0x80 | ((cp >> 6) & 0x3F)); s += (char)(0x80 | (cp & 0x3F)); }
                        break;
                    }
                    default: return false;
                }
                p_++;
            } else {
                if (*p_ == '\n') line_++;
                s += *p_++;
            }
        }
        if (p_ >= end_) return false;
        p_++; // "
        MemoryPoolAllocator<> a;
        out.SetString(s, a);
        return true;
    }

    bool parseNumber(Value &out) {
        const char *start = p_;
        bool isDouble = false;
        if (p_ < end_ && (*p_ == '-' || *p_ == '+')) p_++;
        while (p_ < end_ && ((*p_ >= '0' && *p_ <= '9') || *p_ == '.' || *p_ == 'e' || *p_ == 'E' || *p_ == '+' || *p_ == '-')) {
            if (*p_ == '.' || *p_ == 'e' || *p_ == 'E') isDouble = true;
            p_++;
        }
        if (p_ == start) return false;
        std::string tok(start, p_);
        if (!isDouble) {
            errno = 0;
            char *endp = nullptr;
            long long v = strtoll(tok.c_str(), &endp, 10);
            if (errno == 0 && endp && *endp == '\0') {
                out = Value((int64_t)v);
                return true;
            }
            isDouble = true;
        }
        out = Value(strtod(tok.c_str(), nullptr));
        return true;
    }
};

class Document : public Value {
public:
    typedef MemoryPoolAllocator<> AllocatorType;

    Document() : Value() {}

    AllocatorType &GetAllocator() { return allocator_; }

    template<typename Stream>
    Document &ParseStream(Stream &stream) {
        std::string buf;
        char c;
        while ((c = stream.Take()) != '\0') buf += c;
        JsonParser parser(buf.data(), buf.size());
        Value v;
        parseError_ = parser.parse(v) ? kParseErrorNone : kParseErrorGeneric;
        errorLine_ = parser.line();
        if (parseError_ == kParseErrorNone) {
            Value::operator=(std::move(v));
        }
        return *this;
    }

    Document &Parse(const char *json) {
        JsonParser parser(json, std::strlen(json));
        Value v;
        parseError_ = parser.parse(v) ? kParseErrorNone : kParseErrorGeneric;
        errorLine_ = parser.line();
        if (parseError_ == kParseErrorNone) {
            Value::operator=(std::move(v));
        }
        return *this;
    }

    bool HasParseError() const { return parseError_ != kParseErrorNone; }
    ParseErrorCode GetParseError() const { return parseError_; }
    size_t GetErrorOffset() const { return 0; }
    size_t errorLine() const { return errorLine_; }

private:
    AllocatorType allocator_;
    ParseErrorCode parseError_ = kParseErrorNone;
    size_t errorLine_ = 0;
};

} // namespace rapidjson

#endif
